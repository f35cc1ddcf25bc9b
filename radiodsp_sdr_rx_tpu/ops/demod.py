"""Demodulators: SSB (USB/LSB/CW), AM envelope, SAM (synchronous AM).

Behavioral replacement for the AudioSDR demod engine the reference drives via
``SDR.setDemodMode({LSBmode, USBmode, CW_LSBmode, CW_USBmode, AMmode, SAMmode})``
(call sites: src/RadioDSP_SDR_RX/RDSP_controls.h:330-423,
RadioDSP_SDR_RX.ino:139). AudioSDR is not vendored, so the demodulators are
designed TPU-first from the modes' definitions:

- The quadrature DDC (ops/nco.py) centers the tuned signal at 0 Hz complex
  baseband. Sideband selection is done by the complex band-pass overlap-save
  FIR (ops/fastconv.py): USB passes [+lo, +hi], LSB passes [-hi, -lo] — the
  same windowed-sinc complex filter math the reference uses for its passband
  tuning (RDSP_convolutional.h:127-185).
- SSB demod after sideband filtering is then simply Re(z): the phasing method.
- CW is SSB with a side-tone offset applied at the LO (the reference's
  ``TuningOffset`` returned by setDemodMode and subtracted from the VFO before
  the Si5351 write, RDSP_controls.h:445-448); sideband auto-selected by band
  (>10 MHz USB else LSB, RDSP_controls.h:336-352).
- AM is the envelope |z| followed by a DC blocker.
- SAM tracks the carrier with a per-sample PLL (phase+frequency loop) and
  mixes the signal to exact baseband before taking the real part; the PLL is a
  sequential recurrence and runs as lax.scan with channels vmapped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops.iir import dc_blocker

CW_PITCH_HZ = 700.0  # CW side-tone


def demod_ssb(z: jax.Array) -> jax.Array:
    """SSB phasing demod of a sideband-filtered complex baseband: audio = Re(z).

    The complex band-pass ahead of this op has already selected the sideband
    (positive band = USB, negative band = LSB), so the real part *is* the
    audio. Factor 2 restores full amplitude (Re halves the analytic signal).
    """
    return 2.0 * z.real


def demod_am(z: jax.Array, dc_state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """AM envelope demod: audio = |z| - DC. Returns (audio, new_dc_state)."""
    env = jnp.abs(z)
    return dc_blocker(env, dc_state)


class SAMState(NamedTuple):
    phase: jax.Array  # f32 rad, PLL phase
    freq: jax.Array   # f32 rad/sample, PLL frequency estimate
    dc: jax.Array     # (2,) DC-blocker carry


def sam_init() -> SAMState:
    """Host NumPy leaves — no device compute at init time."""
    import numpy as np

    return SAMState(
        phase=np.float32(0.0),
        freq=np.float32(0.0),
        dc=np.zeros(2, np.float32),
    )


def demod_sam(
    z: jax.Array,
    state: SAMState,
    bw_hz: float = 100.0,
    sample_rate: float = 44117.64706,
) -> tuple[jax.Array, SAMState]:
    """Synchronous AM: PLL locks to the (possibly offset/drifting) carrier.

    z: (n,) complex64 baseband containing the AM carrier near 0 Hz.
    Second-order loop with natural frequency ``bw_hz`` and damping 0.707.
    Returns (audio, new_state).
    """
    wn = 2.0 * jnp.pi * bw_hz / sample_rate
    zeta = 0.70710678
    kp = jnp.float32(2.0 * zeta * wn)
    ki = jnp.float32(wn * wn)
    max_freq = jnp.float32(2.0 * jnp.pi * 2000.0 / sample_rate)

    def step(carry, zn):
        phase, freq = carry
        ref = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        v = zn * jnp.conj(ref)
        err = jnp.arctan2(v.imag, v.real)
        freq = jnp.clip(freq + ki * err, -max_freq, max_freq)
        phase = jnp.mod(phase + freq + kp * err, 2.0 * jnp.pi)
        return (phase, freq), v.real

    (phase, freq), audio = jax.lax.scan(step, (state.phase, state.freq), z)
    audio, dc = dc_blocker(audio, state.dc)
    return audio, SAMState(phase=phase, freq=freq, dc=dc)


def hilbert_bandpass_mask(n: int) -> jax.Array:
    """FFT mask selecting positive frequencies (analytic-signal construction).

    Utility for SSB test-signal generation: ``ifft(fft(x) * mask)`` turns a real
    voice signal into its analytic signal for single-sideband synthesis.
    """
    mask = jnp.zeros(n, jnp.float32)
    mask = mask.at[0].set(1.0)
    mask = mask.at[1 : n // 2].set(2.0)
    mask = mask.at[n // 2].set(1.0)
    return mask
