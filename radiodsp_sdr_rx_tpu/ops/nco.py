"""Numerically-controlled oscillator (quadrature DDC mixing).

The reference receiver shifts the passband with an *analog* LO: an Si5351 PLL
clocked at 4x(vfoFreq - TuningOffset) feeding a quadrature sampling detector
(ref: src/RadioDSP_SDR_RX/RDSP_controls.h:445-448 ``sendFreq``). In the
TPU-native framework the LO is a digital NCO applied to the captured IQ stream;
retuning is a new frequency scalar into the jitted step, not an I2C transaction.

Design note (TPU-exact phase): the phase accumulator is a uint32 fraction of a
cycle — exactly how a hardware DDS works. ``phase[n] = phase0 + n * inc`` in
wrap-around uint32 arithmetic is drift-free for arbitrarily long streams,
whereas a float32 accumulator would lose cycles after ~1e5 samples. The uint32
phase quantization (2^-32 cycles) is far below the q15 noise floor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_TWO_POW_32 = 4294967296.0
_PHASE_SCALE = np.float32(2.0 * np.pi / _TWO_POW_32)


def freq_to_phase_inc(freq_hz, sample_rate: float) -> np.uint32:
    """Convert a frequency in Hz to a uint32 phase increment (cycles * 2^32).

    Host-side (NumPy, float64) — this is configuration math, not device
    compute; the result feeds the jitted pipeline as a plain uint32.
    """
    cycles = np.asarray(freq_hz, np.float64) / sample_rate
    frac = cycles - np.floor(cycles)
    return (np.round(frac * _TWO_POW_32).astype(np.int64) % (1 << 32)).astype(np.uint32)


def nco_phases(n: int, phase0: jax.Array, phase_inc: jax.Array) -> jax.Array:
    """uint32 phase sequence phase0 + [0..n) * inc (wrap-around exact)."""
    idx = jax.lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
    return phase0 + idx * phase_inc


def nco_phase_advance(phase0: jax.Array, phase_inc: jax.Array, n) -> jax.Array:
    """Phase carry after n samples (uint32 wrap-around)."""
    return phase0 + jnp.asarray(n, jnp.uint32) * phase_inc


def nco_mix(
    x: jax.Array,
    phase0: jax.Array,
    phase_inc: jax.Array,
    conj: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Mix a complex IQ stream with the NCO: y[n] = x[n] * exp(-+j*2*pi*phase[n]).

    x:      (..., n) complex64
    phase0: uint32 scalar (or batched (...,)) phase carry in 2^-32 cycles
    conj:   True mixes *down* by +inc Hz (multiplies by exp(-j*w*n)), the usual
            DDC direction.

    Returns (y, next_phase0).
    """
    n = x.shape[-1]
    phases = nco_phases(n, jnp.asarray(phase0, jnp.uint32), phase_inc)
    ang = phases.astype(jnp.float32) * _PHASE_SCALE
    lo = jax.lax.complex(jnp.cos(ang), jnp.sin(ang))
    if conj:
        lo = jnp.conj(lo)
    return x * lo, nco_phase_advance(phase0, phase_inc, n)
