"""Chain-level goldens vs the transcribed reference oracle (VERDICT r4 #9).

Unlike the per-kernel oracles (test_lms, test_fir_design, ...) these drive
the framework's *composed* stages — the PBT conv filter COUPLED to the LMS
denoiser across streaming blocks, and the backup sketch's inline denoise —
against ``tests/reference_oracle.py``, a literal NumPy port of the
reference's own main loop. The gate pins the framework to the reference's
math, not to itself."""

import numpy as np
import jax.numpy as jnp

from reference_oracle import (
    conv_lms_loop, fir_mask, inline_denoise_loop, ref_mu)
from radiodsp_sdr_rx_tpu.models.config import (
    AGCMode, DemodMode, ReceiverConfig)
from radiodsp_sdr_rx_tpu.ops import fir_design, lms, pallas_kernels, planar
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def _scene(n, rng):
    """Noisy voice-band audio: tone stack + broadband noise."""
    t = np.arange(n) / FS
    a = (0.3 * np.sin(2 * np.pi * 700.0 * t)
         + 0.2 * np.sin(2 * np.pi * 1450.0 * t)
         + 0.1 * np.sin(2 * np.pi * 2100.0 * t))
    return (a + rng.standard_normal(n) * 0.05).astype(np.float32)


def _framework_conv_lms(audio, lo, hi, nr_level):
    """The framework's post-demod sub-chain exactly as rx_chain composes it
    (models/receiver.py): collapsed-MXU PBT operator -> LMS denoise
    -> x1.1 makeup, R <- L."""
    mask = fir_design.design_filter_mask(lo, hi, FS, 256, window_id=0)
    w_pbt = pallas_kernels.pbt_operator(mask)
    l, r, _ = planar.pbt_filter_planar(
        jnp.asarray(audio), jnp.asarray(w_pbt),
        jnp.zeros(128, jnp.float32))
    if nr_level > 0:
        y, _ = lms.lms_nr_run(l, lms.lms_nr_init(),
                              float(lms.lms_mu_from_strength(nr_level)),
                              mode="denoise")
        l = y * 1.1
        r = l
    return np.asarray(l), np.asarray(r)


def test_conv_loop_matches_reference_transcription(rng):
    """Filter-only loop (nr off): the framework's one-matmul collapsed
    overlap-save operator vs the reference's literal FFT->mask->iFFT frame
    loop (RDSP_convolutional.h:228-318)."""
    audio = _scene(4096, rng)
    mask = fir_mask(300.0, 4000.0, FS)
    want_l, want_r = conv_lms_loop(audio, audio, mask, nr_level=0.0)
    got_l, got_r = _framework_conv_lms(audio, 300.0, 4000.0, 0)
    np.testing.assert_allclose(got_l, want_l, atol=2e-5)
    np.testing.assert_allclose(got_r, want_r, atol=2e-5)


def test_conv_lms_chain_matches_reference_transcription(rng):
    """Full main-loop chain with DNR2 (strength 30): conv output feeds the
    adaptive LMS whose state carries across every 128-block — the coupled
    two-stage recurrence of RDSP_convolutional.h:228-353."""
    audio = _scene(4096, rng)
    np.testing.assert_allclose(float(lms.lms_mu_from_strength(30)),
                               ref_mu(30), rtol=1e-6)
    mask = fir_mask(300.0, 4000.0, FS)
    want_l, want_r = conv_lms_loop(audio, audio, mask, nr_level=30.0)
    got_l, got_r = _framework_conv_lms(audio, 300.0, 4000.0, 30)
    # adaptive recurrence in f32 vs the f64 oracle: tolerance grows with
    # depth; 4096 samples stay well inside the suite's 2e-3 parity bound
    np.testing.assert_allclose(got_l, want_l, atol=2e-3)
    np.testing.assert_array_equal(got_l, got_r)


def test_inline_denoise_matches_reference_transcription(rng):
    """ops/planar.inline_denoise_planar vs the transcribed backup-sketch
    denoise loop (Conv.ino:1520-1650) on a noisy carrier scene."""
    n = 2048
    t = np.arange(n) / FS
    iq = (0.3 * np.exp(2j * np.pi * 1000.0 * t)
          + (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.03
          ).astype(np.complex64)
    want_r, want_i = inline_denoise_loop(iq.real, iq.imag)
    dft_c, dft_s = planar.dft_matrices(256)
    got_r, got_i, _, _ = planar.inline_denoise_planar(
        jnp.asarray(iq.real), jnp.asarray(iq.imag),
        jnp.asarray(dft_c), jnp.asarray(dft_s),
        jnp.zeros(128, jnp.float32), jnp.zeros(128, jnp.float32))
    # nonlinear magnitude thresholding: bins near the threshold may take the
    # other branch in f32; bound the energy of the disagreement, not its max
    err = np.concatenate([np.asarray(got_r) - want_r,
                          np.asarray(got_i) - want_i])
    sig = np.concatenate([want_r, want_i])
    assert float(np.sqrt(np.mean(err ** 2))) < 2e-3 * max(
        1.0, float(np.sqrt(np.mean(sig ** 2))))


def test_receiver_conv_inline_denoise_end_to_end(rng):
    """The backup DENOISE build end-to-end (conv_first + inline denoise
    pre-demod): tone survives, denoise attenuates the between-carrier noise
    floor vs the bypass build, streaming carry exact."""
    from radiodsp_sdr_rx_tpu.models.receiver import Receiver

    n = 1 << 14
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    iq = (iq + (rng.standard_normal(n) + 1j * rng.standard_normal(n))
          .astype(np.complex64) * 0.01)
    cfg = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=7_060_000.0,
        capture_center_freq=7_050_000.0, agc=AGCMode.OFF,
        conv_first=True, conv_inline_denoise=True)
    rx = Receiver(cfg)
    out, _ = rx.process(iq, rx.init_state())
    a = np.asarray(out["audio_l"])
    assert np.isfinite(a).all()
    # the 1 kHz tone survives the over-subtraction
    win = np.hanning(n)
    spec = np.abs(np.fft.rfft(a * win))
    freqs = np.fft.rfftfreq(n, 1 / FS)
    k_tone = int(np.argmin(np.abs(freqs - 1000.0)))
    tone = spec[max(0, k_tone - 3) : k_tone + 4].max()
    floor = np.median(spec[(freqs > 1500) & (freqs < 3000)])
    assert tone > 30 * floor
    # streaming carry: two halves == one pass
    out1, st = rx.process(iq[: n // 2], rx.init_state())
    out2, _ = rx.process(iq[n // 2 :], st)
    np.testing.assert_allclose(
        np.concatenate([out1["audio_l"], out2["audio_l"]]), a, atol=1e-5)
