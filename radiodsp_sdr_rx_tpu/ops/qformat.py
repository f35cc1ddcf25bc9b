"""q15 fixed-point round-trip ops.

The reference's audio path is q15 (int16) at the I2S boundaries and converts to
float for DSP (ref: src/RadioDSP_SDR_RX/RDSP_convolutional.h:241-242, 346-347,
CMSIS ``arm_q15_to_float`` / ``arm_float_to_q15``). These ops replicate CMSIS
semantics exactly so tests can assert bit-faithfulness of quantized outputs:

  q15_to_float: f = q / 32768
  float_to_q15: q = saturate_int16(trunc(f * 32768))   (C cast truncates toward 0)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def q15_to_float(q: jax.Array) -> jax.Array:
    """int16 q15 -> float32 in [-1, 1). CMSIS arm_q15_to_float semantics."""
    return q.astype(jnp.float32) * (1.0 / 32768.0)


def float_to_q15(f: jax.Array) -> jax.Array:
    """float32 -> int16 q15 with CMSIS arm_float_to_q15 semantics.

    Scale by 32768, truncate toward zero (the C ``(q31_t)`` cast), saturate to
    [-32768, 32767].
    """
    scaled = jnp.trunc(f * 32768.0)
    return jnp.clip(scaled, -32768.0, 32767.0).astype(jnp.int16)


def quantize_q15(f: jax.Array) -> jax.Array:
    """Round-trip float through q15 (the quantization the reference audio path
    applies at every queue boundary)."""
    return q15_to_float(float_to_q15(f))
