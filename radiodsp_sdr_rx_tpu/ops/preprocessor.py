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


def detect_iq_error_host(xr, xi) -> int:
    """Host-side (NumPy) slip detector over planar f32 — the boot-time analog
    of ``startAutoI2SerrorDetection`` (RadioDSP_SDR_RX.ino:117). Runs once per
    stream on the first segment; the result is locked and applied to every
    subsequent segment (the reference detects at startup, then the repair is
    fixed).

    Candidates are {identity, delay I, delay Q} — the I2S one-sample-slip
    error classes the reference auto-detects. An I/Q *swap* is NOT detectable
    by spectral asymmetry (swapping mirrors the spectrum, which is exactly as
    asymmetric), and the reference treats it as a manual option too: the
    ``preProcessor.swapIQ(...)`` call is present but commented out
    (RadioDSP_SDR_RX.ino:118) — use ``ReceiverConfig.swap_iq``. Host NumPy
    because the deployment TPU runtime rejects complex-typed programs
    (ops/planar.py) and detection is control-plane, not hot-path.

    Returns 0 (aligned), 2 (delay I), or 3 (delay Q) — apply_repair indices.
    """
    import numpy as np

    xr = np.asarray(xr, np.float32)
    xi = np.asarray(xi, np.float32)

    def delay1(x):
        return np.concatenate([x[..., :1], x[..., :-1]], axis=-1)

    cands = {
        0: xr + 1j * xi,
        2: delay1(xr) + 1j * xi,
        3: xr + 1j * delay1(xi),
    }
    best, best_score = 0, -1.0
    for idx, z in cands.items():
        spec = np.fft.fft(z, axis=-1)
        n = spec.shape[-1]
        pos = np.sum(np.abs(spec[..., 1: n // 2]) ** 2, axis=-1)
        neg = np.sum(np.abs(spec[..., n // 2 + 1:]) ** 2, axis=-1)
        score = float(np.mean(np.abs(pos - neg) / (pos + neg + 1e-12)))
        if score > best_score:
            best, best_score = idx, score
    return best


def apply_repair_planar_host(xr, xi, idx: int, carry=None):
    """Apply a locked repair index to one planar segment, streaming-safe.

    carry: (last_i, last_q) of the previous RAW segment (None at stream
    start — delay repairs then replicate the first sample, matching
    ``_candidates``). Returns (xr', xi', new_carry).
    """
    import numpy as np

    xr = np.asarray(xr, np.float32)
    xi = np.asarray(xi, np.float32)
    new_carry = (xr[..., -1:].copy(), xi[..., -1:].copy())
    ci = carry[0] if carry is not None else xr[..., :1]
    cq = carry[1] if carry is not None else xi[..., :1]
    if idx == 1:                                   # swap I/Q
        xr, xi = xi, xr
    elif idx == 2:                                 # delay I one sample
        xr = np.concatenate([ci, xr[..., :-1]], axis=-1)
    elif idx == 3:                                 # delay Q one sample
        xi = np.concatenate([cq, xi[..., :-1]], axis=-1)
    return xr, xi, new_carry


def preprocess(
    iq: jax.Array,
    gain_balance: float = IQ_GAIN_BALANCE_DEFAULT,
    auto_repair: bool = True,
) -> jax.Array:
    """Full preprocessor: optional auto I2S repair then IQ gain balance."""
    if auto_repair:
        iq = repair_iq(iq, detect_iq_error(iq))
    return iq_gain_balance(iq, gain_balance)
