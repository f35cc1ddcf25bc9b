"""First- and second-order IIR sections as parallel affine scans.

The reference uses Teensy ``AudioFilterBiquad.setHighpass(0, 500, 0.5)`` to
DC-clean I/Q ahead of the panadapter FFT (ref: RadioDSP_SDR_RX.ino:59-60,
155-156), and AM demodulation needs a DC blocker. A per-sample IIR is a linear
recurrence — associative — so instead of a sequential loop we run
``jax.lax.associative_scan`` over affine maps (O(log n) depth on the VPU).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def _affine_combine(a, b):
    """Compose affine maps s -> A s + B (scalar A) left-to-right."""
    a1, b1 = a
    a2, b2 = b
    return a2 * a1, a2 * b1 + b2


def first_order_iir(x: jax.Array, a: float, b, y0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """y[n] = a*y[n-1] + b*x[n], fully parallel via associative scan.

    x: (..., n); y0: (...,) carry. Returns (y, y_last).
    """
    av = jnp.full_like(x, a)
    bv = b * x
    # inject the carry into the first element
    bv = bv.at[..., 0].add(a * y0)
    accum_a, accum_b = jax.lax.associative_scan(_affine_combine, (av, bv), axis=-1)
    del accum_a
    return accum_b, accum_b[..., -1]


def dc_blocker(x: jax.Array, y0: jax.Array, pole: float = 0.995) -> tuple[jax.Array, jax.Array]:
    """Standard DC blocker y[n] = x[n] - x[n-1] + pole*y[n-1].

    y0: (..., 2) carry = (last input sample, last output sample).
    Returns (y, new_carry).
    """
    x_prev = jnp.concatenate([y0[..., :1], x[..., :-1]], axis=-1)
    diff = x - x_prev
    y, y_last = first_order_iir(diff, pole, 1.0, y0[..., 1])
    return y, jnp.stack([x[..., -1], y_last], axis=-1)


class BiquadCoeffs(NamedTuple):
    b0: float
    b1: float
    b2: float
    a1: float  # sign convention: y[n] = b0 x + b1 x1 + b2 x2 - a1 y1 - a2 y2
    a2: float


def biquad_highpass(f0: float, sample_rate: float, q: float = 0.5) -> BiquadCoeffs:
    """RBJ cookbook high-pass, matching Teensy AudioFilterBiquad.setHighpass
    (call site RadioDSP_SDR_RX.ino:155-156: stage 0, 500 Hz, Q=0.5)."""
    w0 = 2.0 * math.pi * f0 / sample_rate
    alpha = math.sin(w0) / (2.0 * q)
    cw = math.cos(w0)
    a0 = 1.0 + alpha
    return BiquadCoeffs(
        b0=(1.0 + cw) / 2.0 / a0,
        b1=-(1.0 + cw) / a0,
        b2=(1.0 + cw) / 2.0 / a0,
        a1=(-2.0 * cw) / a0,
        a2=(1.0 - alpha) / a0,
    )


def biquad_apply(
    x: jax.Array, coeffs: BiquadCoeffs, state0: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Direct-form-II-transposed biquad via lax.scan.

    x: (..., n) with leading dims batched; state0: (..., 2).
    Returns (y, new_state). Sequential over n (second-order recurrences are run
    rarely — only ahead of the panadapter — so a scan is fine; the hot filters
    are the overlap-save FIRs).
    """
    xs = jnp.moveaxis(x, -1, 0)

    def step(s, xn):
        s1, s2 = s[..., 0], s[..., 1]
        y = coeffs.b0 * xn + s1
        s1n = coeffs.b1 * xn - coeffs.a1 * y + s2
        s2n = coeffs.b2 * xn - coeffs.a2 * y
        return jnp.stack([s1n, s2n], axis=-1), y

    state, ys = jax.lax.scan(step, state0, xs)
    return jnp.moveaxis(ys, 0, -1), state
