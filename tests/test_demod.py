"""Demodulator + spectral subtraction tests: SNR-bound oracle checks on
synthetic signals (SURVEY.md §4 integration strategy, BASELINE.json configs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import demod, fastconv, fir_design, spectral_sub
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def _tone_snr_db(audio, tone_hz, fs=FS, skip=4000, band=60.0):
    a = np.asarray(audio, np.float64)[skip:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / fs)
    sig = spec[(freqs > tone_hz - band) & (freqs < tone_hz + band)].sum()
    rest = spec[(freqs > 100) & (freqs < 5000)].sum() - sig
    return 10 * np.log10(sig / max(rest, 1e-30))


def _bandpass(z, lo, hi):
    mask = fir_design.design_filter_mask(lo, hi, FS)
    w = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    y, _ = fastconv.overlap_save_filter(z, w, jnp.zeros(128, jnp.complex64))
    return y


def test_ssb_demod_recovers_tone():
    """USB: a 1 kHz audio tone synthesized as SSB at baseband demodulates back
    to a clean 1 kHz tone."""
    n = 65536
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 0.0, FS, "usb", amp=0.5)
    z = _bandpass(jnp.asarray(iq), 300.0, 3000.0)
    audio = np.asarray(demod.demod_ssb(z))
    assert _tone_snr_db(audio, 1000.0) > 40.0


def test_lsb_demod_with_negative_band():
    n = 65536
    audio_in = np.sin(2 * np.pi * 800.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 0.0, FS, "lsb", amp=0.5)
    z = _bandpass(jnp.asarray(iq), -3000.0, -300.0)
    audio = np.asarray(demod.demod_ssb(z))
    assert _tone_snr_db(audio, 800.0) > 40.0


def test_ssb_rejects_opposite_sideband():
    """A USB receiver must reject an LSB signal (image rejection)."""
    n = 65536
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    lsb = siggen.ssb_from_audio(audio_in, 0.0, FS, "lsb", amp=0.5)
    z = _bandpass(jnp.asarray(lsb), 300.0, 3000.0)
    audio = np.asarray(demod.demod_ssb(z))
    # residual 1 kHz content should be tiny
    a = audio[4000:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    freqs = np.fft.rfftfreq(len(a), 1 / FS)
    peak = spec[(freqs > 900) & (freqs < 1100)].max()
    ref = np.abs(np.fft.rfft(audio_in[4000:] * np.hanning(len(a)))).max()
    assert peak < ref * 3e-3  # > 50 dB rejection


@pytest.mark.slow
def test_am_envelope_demod():
    """BASELINE config 1 shape: AM carrier, 1 kHz modulation, envelope demod."""
    n = 65536
    iq = siggen.am_signal(n, 0.0, mod_hz=1000.0, depth=0.5, fs=FS)
    audio, _ = demod.demod_am(jnp.asarray(iq), jnp.zeros(2, jnp.float32))
    assert _tone_snr_db(np.asarray(audio), 1000.0) > 40.0


def test_sam_locks_offset_carrier():
    """SAM PLL: carrier offset by 40 Hz (mistuning) still demodulates cleanly;
    plain envelope would be unaffected but SAM must track the offset."""
    n = 65536
    iq = siggen.am_signal(n, 40.0, mod_hz=1000.0, depth=0.5, fs=FS)
    audio, st = demod.demod_sam(jnp.asarray(iq), demod.sam_init(), sample_rate=FS)
    assert _tone_snr_db(np.asarray(audio), 1000.0, skip=20000) > 35.0
    # PLL frequency estimate converged to ~40 Hz
    got_hz = float(st.freq) * FS / (2 * np.pi)
    assert abs(got_hz - 40.0) < 5.0


def test_sam_streaming_continuity():
    n = 32768
    iq = siggen.am_signal(2 * n, 25.0, mod_hz=700.0, fs=FS)
    a_full, _ = demod.demod_sam(jnp.asarray(iq), demod.sam_init(), sample_rate=FS)
    a1, st = demod.demod_sam(jnp.asarray(iq[:n]), demod.sam_init(), sample_rate=FS)
    a2, _ = demod.demod_sam(jnp.asarray(iq[n:]), st, sample_rate=FS)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(a1), np.asarray(a2)]), np.asarray(a_full), atol=1e-4
    )


def test_spectral_subtraction_improves_snr():
    """BASELINE config 4 shape: band-limited noisy audio through the backup
    engine's spectral subtraction gains SNR. The VAD band (bins 30-180, i.e.
    5-31 kHz) assumes the audio was already band-limited < 4 kHz by the PBT
    filter — the reference's actual chain order."""
    n = 131072
    t = np.arange(n) / FS
    clean = 0.4 * np.sin(2 * np.pi * 900.0 * t)
    noisy = (clean + siggen.noise(n, 0.15, complex_=False)).astype(np.float32)
    # PBT band-pass first (reference conv engine runs before the NR stage)
    zf = _bandpass(jnp.asarray(noisy) + 0j * jnp.asarray(noisy), 300.0, 4000.0)
    frames = fastconv.frame_overlap_save(zf, jnp.zeros(128, jnp.complex64))
    out, nfloor = spectral_sub.spectral_subtract_frames(frames, 20.0,
                                                        jnp.float32(0.0))
    y = np.asarray(out).reshape(-1).real
    snr_in = _tone_snr_db(np.asarray(zf.real), 900.0)
    snr_out = _tone_snr_db(y, 900.0)
    assert snr_out > snr_in + 1.0
    assert float(nfloor) > 0.0


def test_spectral_subtraction_streaming_floor_carry():
    n = 65536
    noisy = siggen.noise(n, 0.2, complex_=False).astype(np.float32)
    z = (jnp.asarray(noisy) + 0j).astype(jnp.complex64)
    frames = fastconv.frame_overlap_save(z, jnp.zeros(128, jnp.complex64))
    _, nf_full = spectral_sub.spectral_subtract_frames(frames, 30.0, jnp.float32(0.0))
    half = frames.shape[0] // 2
    _, nf1 = spectral_sub.spectral_subtract_frames(frames[:half], 30.0, jnp.float32(0.0))
    _, nf2 = spectral_sub.spectral_subtract_frames(frames[half:], 30.0, nf1)
    np.testing.assert_allclose(float(nf2), float(nf_full), rtol=1e-4)
