"""Spectral-subtraction noise reduction with VAD-band noise-floor tracking.

Reproduces the math of the reference's experimental engine
(ref: src/backup/RDSP_convolutional_spec.h:109-252):

  per 256-pt overlap-save frame:
    mag       = |FFT(frame)|                                 (:179-182)
    floor_est = mean(mag[30:181]) * (level * 1.5)            (:194-202, VAD band
                STATING/ENDING_BIN_VAD_ANALISYS = 30..180 inclusive; the mean
                divides by 150 — the reference divides by (end-start), one
                fewer than the number of summed bins, replicated here)
    nfloor   += (floor_est - nfloor) * 0.65                  (:114, :205-206)
    mag'      = where(mag <= nfloor, mag * 0.2, mag - nfloor) (:210-218)
    frame'    = iFFT(mag' * exp(j*angle(FFT(frame))))        (:221-243)
    out       = frame'[128:]                                 (:246-252)

The noise-floor tracker is a frame-serial one-pole recurrence; it runs as a
parallel associative scan over frames, and everything else is batched
elementwise + FFT — no per-frame Python loop. NR levels map from the menu's
DNR1-4 = {20, 30, 40, 50} (RDSP_controls.h:265-294).

Note the reference applies the subtraction to the *interleaved* magnitude
buffer over ``FFT_length*2`` entries, but entries >= FFT_length are zero (the
magnitude array only has FFT_length valid values), so the effective math is the
per-bin form above.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

VAD_START_BIN = 30   # STATING_BIN_VAD_ANALISYS (RDSP_convolutional_spec.h:34)
VAD_END_BIN = 180    # ENDING_BIN_VAD_ANALISYS (RDSP_convolutional_spec.h:35)
FLOOR_BETA = 0.65    # one-pole floor tracking (RDSP_convolutional_spec.h:114)
UNDER_FLOOR_GAIN = 0.2  # below-floor attenuation (RDSP_convolutional_spec.h:214)

# the backup sketch's INLINE pre-demod denoise threshold law
# (src/backup/RadioDSP_SDR_RX_Conv.ino:1591-1597): mean of magnitude bins
# 60..120 inclusive — 61 bins summed, divided by 60 (replicated off-by-one)
# — times 3; applied with the same 0.2 under-floor gain
INLINE_START_BIN = 60
INLINE_END_BIN = 120
INLINE_MULT = 3.0
INLINE_SEED = 0.8    # loop() reseed when the menu enables denoise (:1347)


@functools.lru_cache(maxsize=4)
def spectral_matmul_ops(n: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """Planar DFT / right-half-iDFT collapsed into two MXU operators for the
    in-kernel spectral stage (ops/pallas_sweep_spec.py).

    Forward (z = L + jR per the reference frame layout,
    RDSP_convolutional_spec.h:158-175):
        [fl | fr] (., 2n) @ W_fwd (2n, 2n) = [sr | si]
        with sr = fl@C + fr@S, si = fr@C - fl@S  (C/S = cos/sin DFT matrices)
    Inverse, right overlap-save half only (:243-252):
        [sr' | si'] @ W_inv (2n, n) = [yl_right | yr_right]
        with yl = (sr'@C - si'@S)/n, yr = (si'@C + sr'@S)/n, columns n/2..n.

    Built once on host in float64, emitted f32.
    """
    k = np.arange(n)
    w = 2.0 * np.pi * np.outer(k, k) / n
    c = np.cos(w)
    s = np.sin(w)
    w_fwd = np.block([[c, -s], [s, c]]).astype(np.float32)
    cr = c[:, n // 2:] / n
    sr_ = s[:, n // 2:] / n
    w_inv = np.block([[cr, sr_], [-sr_, cr]]).astype(np.float32)
    return w_fwd, w_inv


def spectral_subtract_frames(
    frames: jax.Array,
    nr_level,
    nfloor0: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Apply spectral subtraction to a batch of overlap-save frames.

    frames:  (..., nb, fft_length) complex64 — from fastconv.frame_overlap_save
    nr_level: scalar strength (reference levels 20/30/40/50)
    nfloor0: (...,) noise-floor carry from previous segment
    Returns (filtered_right_halves (..., nb, fft_length/2) complex, nfloor_last).
    """
    fft_length = frames.shape[-1]
    spec = jnp.fft.fft(frames, axis=-1)
    mag = jnp.abs(spec)

    # Per-frame raw floor estimate from the VAD band (mean over the band; the
    # reference divides the 151-bin sum by 150).
    band = mag[..., VAD_START_BIN : VAD_END_BIN + 1]
    floor_est = jnp.sum(band, axis=-1) / (VAD_END_BIN - VAD_START_BIN)
    floor_est = floor_est * (jnp.asarray(nr_level, jnp.float32) * 1.5)

    # nfloor[k] = nfloor[k-1]*(1-beta) + floor_est[k]*beta — frame-serial
    # one-pole, parallelized with an associative scan over the frame axis.
    a = 1.0 - FLOOR_BETA

    def combine(p, q):
        a1, b1 = p
        a2, b2 = q
        return a1 * a2, b1 * a2 + b2

    av = jnp.full_like(floor_est, a)
    bv = FLOOR_BETA * floor_est
    bv = bv.at[..., 0].add(a * nfloor0)
    _, nfloor = jax.lax.associative_scan(combine, (av, bv), axis=-1)
    nfloor = jnp.maximum(nfloor, 0.0)  # clamp (RDSP_convolutional_spec.h:206)

    nf = nfloor[..., None]
    mag_sub = jnp.where(mag <= nf, mag * UNDER_FLOOR_GAIN, mag - nf)

    # resynthesize from subtracted magnitude + original phase (:221-238)
    phase = jnp.angle(spec)
    new_spec = jax.lax.complex(mag_sub * jnp.cos(phase), mag_sub * jnp.sin(phase))
    out = jnp.fft.ifft(new_spec, axis=-1)[..., fft_length // 2 :]
    return out, nfloor[..., -1]
