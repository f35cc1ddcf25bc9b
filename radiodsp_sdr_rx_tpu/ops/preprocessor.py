"""IQ pre-processor: gain balance and I2S-misalignment detection/repair.

Behavioral replacement for ``AudioSDRpreProcessor`` + ``setIQgainBalance``
(call sites: RadioDSP_SDR_RX.ino:117-118, 135). The real SDR failure mode this
guards against (SURVEY.md §5 "failure detection"): the stereo I2S link can come
up with I/Q swapped or slipped by one sample, which destroys image rejection.
The reference auto-detects and repairs this (``startAutoI2SerrorDetection``).

TPU-native version: the four candidate repairs (identity, swap I/Q, delay I,
delay Q) are all applied as cheap tensor ops; the detector scores each by the
spectral-asymmetry ratio (a correctly-aligned quadrature capture of a
real-world band is strongly asymmetric between positive and negative
frequencies, while swap/slip collapse that asymmetry) and the best candidate is
selected with ``jnp.argmax`` — no data-dependent control flow, jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IQ_GAIN_BALANCE_DEFAULT = 1.020  # SDR.setIQgainBalance (RadioDSP_SDR_RX.ino:135)


def iq_gain_balance(iq: jax.Array, gain: float = IQ_GAIN_BALANCE_DEFAULT) -> jax.Array:
    """Scale the Q channel to balance codec channel gains."""
    return jax.lax.complex(iq.real, iq.imag * gain)


def _candidates(iq: jax.Array) -> jax.Array:
    """(4, ..., n) stack: identity, swapped, I delayed 1, Q delayed 1."""
    i, q = iq.real, iq.imag

    def delay1(x):
        return jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)

    return jnp.stack(
        [
            jax.lax.complex(i, q),
            jax.lax.complex(q, i),
            jax.lax.complex(delay1(i), q),
            jax.lax.complex(i, delay1(q)),
        ]
    )


def spectral_asymmetry(iq: jax.Array) -> jax.Array:
    """|E+ - E-| / (E+ + E-) over the last axis — image-rejection proxy."""
    spec = jnp.fft.fft(iq, axis=-1)
    n = spec.shape[-1]
    pos = jnp.sum(jnp.abs(spec[..., 1 : n // 2]) ** 2, axis=-1)
    neg = jnp.sum(jnp.abs(spec[..., n // 2 + 1 :]) ** 2, axis=-1)
    return jnp.abs(pos - neg) / (pos + neg + 1e-12)


def detect_iq_error(iq: jax.Array) -> jax.Array:
    """Return the index (0..3) of the repair maximizing spectral asymmetry."""
    cands = _candidates(iq)
    scores = spectral_asymmetry(cands)
    axes = tuple(range(1, scores.ndim))
    if axes:
        scores = jnp.mean(scores, axis=axes)
    return jnp.argmax(scores)


def repair_iq(iq: jax.Array, repair_idx) -> jax.Array:
    """Apply repair ``repair_idx`` (from detect_iq_error) to the stream."""
    return _candidates(iq)[repair_idx]


def preprocess(
    iq: jax.Array,
    gain_balance: float = IQ_GAIN_BALANCE_DEFAULT,
    auto_repair: bool = True,
) -> jax.Array:
    """Full preprocessor: optional auto I2S repair then IQ gain balance."""
    if auto_repair:
        iq = repair_iq(iq, detect_iq_error(iq))
    return iq_gain_balance(iq, gain_balance)
