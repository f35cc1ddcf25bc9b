"""MXU dot helper shared by the Pallas kernels.

The deployment backend's Mosaic lowering accepts only DEFAULT (1-pass bf16)
and HIGHEST (full f32) dot precisions; ``jax.lax.Precision.HIGH`` raises
"Unsupported dot precision", and the ``DotAlgorithmPreset`` path does not
lower either (both probed on-chip, round 4). ``mxu_dot`` therefore implements
the 3-pass bf16x3 algorithm

    a @ b  ~=  a_hi @ b_hi + a_hi @ b_lo + a_lo @ b_hi

manually when HIGH is requested: measured ~4e-6 relative error (~107 dB SNR)
vs the f32 oracle on the collapsed overlap-save operator shapes — above the
reference's ~90 dB q15 audio boundary (RDSP_convolutional.h:311-316 q15
output path) — at half of HIGHEST's MXU passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_ROWMM = (((1,), (0,)), ((), ()))


def mxu_dot(a: jax.Array, b: jax.Array, precision,
            dims=_ROWMM) -> jax.Array:
    """dot_general with an in-kernel-lowerable HIGH (bf16x3) fallback.

    ``precision`` is a jax.lax.Precision (or None = backend default, 1-pass
    bf16 inside Mosaic). a, b are f32; the result is f32.
    """
    if precision == jax.lax.Precision.HIGH:
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def dd(x, y):
            return jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32)

        return dd(ah, bh) + dd(ah, bl) + dd(al, bh)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32,
                               precision=precision)
