"""Spectrum analyzers: 256-pt IQ panadapter FFT and 1024-pt audio FFT.

TPU-native equivalents of the reference's ``AudioAnalyzeFFT256IQ``
(ref: src/RadioDSP_SDR_RX/analyze_fft256iq.cpp) and Teensy
``AudioAnalyzeFFT1024`` (app config: RadioDSP_SDR_RX.ino:144-148: Hanning
window, averageTogether(30)). Faithful behaviors reproduced:

- 50% frame overlap: each update packs [previous block | current block]
  (analyze_fft256iq.cpp:78-79), i.e. frames of 256 at stride 128.
- window, complex FFT with 1/N scaling (the q15 radix-4 cfft downscales by 1/N;
  we fold the same 1/N into the float FFT so magnitudes line up with the
  display thresholds).
- magnitude-squared averaged over ``naverage`` frames, then sqrt
  (analyze_fft256iq.cpp:86-107, per G. Heinzel averaging).
- the panadapter's center-DC bin reorder ``output[255 - (i ^ 128)] = bin[i]``
  (analyze_fft256iq.cpp:107) — negative frequencies land on the right half,
  both halves frequency-reversed; replicated exactly.
- output scaled by 32768 to match the reference's q15 integer units, which the
  display thresholds (waterfall colors at 5..75, S-meter law) are tuned to;
  ``read()``'s 1/16384 normalization (analyze_fft256iq.h:69-72) is
  ``spectrum_read``.

Instead of one ISR invocation per block, a whole capture's spectrogram is one
batched windowed-DFT: frames x window -> rFFT/cFFT -> |.|^2 -> grouped mean.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops.windows import hann_periodic


def iq_panadapter_bin_order(n: int = 256) -> np.ndarray:
    """Gather indices g with displayed[j] = fftbin[g[j]] per the reference
    reorder output[255-(i^128)] = bin[i] (analyze_fft256iq.cpp:107)."""
    j = np.arange(n)
    return (n - 1 - j) ^ (n // 2)


def _frames_50pct(x: jax.Array, frame: int, tail: jax.Array | None = None) -> jax.Array:
    """Frames of length ``frame`` at stride frame/2 over the last axis.

    With ``tail`` (the previous segment's last half-frame — the reference's
    carried ``prevblock``, analyze_fft256iq.cpp:73-79, 114-117) the framing is
    streaming-exact: frame b = [block b-1 | block b] with the tail standing in
    for block -1, yielding one frame per input block. Without it, frames are
    formed within the segment only (nb-1 frames).
    """
    block = frame // 2
    nb = x.shape[-1] // block
    blocks = x[..., : nb * block].reshape(*x.shape[:-1], nb, block)
    if tail is not None:
        prev = jnp.concatenate([tail[..., None, :], blocks[..., :-1, :]], axis=-2)
        return jnp.concatenate([prev, blocks], axis=-1)
    return jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1)


def iq_spectrum_frames(
    iq: jax.Array,
    naverage: int = 30,
    window: jax.Array | None = None,
    tail: jax.Array | None = None,
) -> jax.Array:
    """Panadapter spectra for a complex IQ stream.

    iq: (..., n) complex64, n a multiple of 128.
    Returns (..., n_updates, 256) f32 in display bin order and reference q15
    units (one row per ``naverage`` frames, matching FFT.available() cadence —
    ~5.7 Hz at the reference's 30-frame averaging, SURVEY.md §6).
    """
    fft_len = 256
    if window is None:
        window = jnp.asarray(hann_periodic(fft_len), jnp.float32)
    frames = _frames_50pct(iq, fft_len, tail) * window
    spec = jnp.fft.fft(frames, axis=-1) / fft_len
    magsq = jnp.abs(spec) ** 2

    nb = magsq.shape[-2]
    ng = nb // naverage
    grouped = magsq[..., : ng * naverage, :].reshape(
        *magsq.shape[:-2], ng, naverage, fft_len
    )
    mean = jnp.mean(grouped, axis=-2)
    mag = jnp.sqrt(mean) * 32768.0
    order = jnp.asarray(iq_panadapter_bin_order(fft_len))
    return mag[..., order]


def audio_spectrum_frames(
    audio: jax.Array,
    naverage: int = 30,
    window: jax.Array | None = None,
    tail: jax.Array | None = None,
) -> jax.Array:
    """1024-pt audio scope spectra (AudioAnalyzeFFT1024 equivalent).

    audio: (..., n) f32, n a multiple of 512.
    Returns (..., n_updates, 512) f32: positive-frequency magnitudes in q15
    units (bins 0..511 of the 1024-pt FFT), averaged over ``naverage`` frames.
    """
    fft_len = 1024
    if window is None:
        window = jnp.asarray(hann_periodic(fft_len), jnp.float32)
    frames = _frames_50pct(audio, fft_len, tail) * window
    spec = jnp.fft.rfft(frames, axis=-1)[..., : fft_len // 2] / fft_len
    magsq = jnp.abs(spec) ** 2

    nb = magsq.shape[-2]
    ng = nb // naverage
    grouped = magsq[..., : ng * naverage, :].reshape(
        *magsq.shape[:-2], ng, naverage, fft_len // 2
    )
    return jnp.sqrt(jnp.mean(grouped, axis=-2)) * 32768.0


def spectrum_read(output: jax.Array) -> jax.Array:
    """The analyzers' read() normalization (analyze_fft256iq.h:69-72)."""
    return output / 16384.0
