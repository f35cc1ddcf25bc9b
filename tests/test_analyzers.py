"""Analyzer tests: bin reorder law, averaging, tone localization, S-meter law,
spectrum smoothing / waterfall (SURVEY.md §4: FFT bin ordering vs
analyze_fft256iq.cpp:107)."""

import numpy as np
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import analyzers
from radiodsp_sdr_rx_tpu.utils import display, siggen, smeter

FS = 44117.64706


def test_bin_order_matches_reference_law():
    """output[255 - (i ^ 128)] = bin[i]  <=>  displayed[j] = bin[(255-j)^128]."""
    order = analyzers.iq_panadapter_bin_order(256)
    # reconstruct the reference's scatter and compare
    scatter = np.zeros(256, int)
    for i in range(256):
        scatter[255 - (i ^ 128)] = i
    np.testing.assert_array_equal(order, scatter)


def test_panadapter_tone_position():
    """A +5 kHz carrier must appear right of center; -5 kHz left of center."""
    n = 256 * 128  # plenty of frames
    for f, side in [(5000.0, "right"), (-5000.0, "left")]:
        iq = jnp.asarray(siggen.carrier(n, f, FS, amp=0.5))
        spec = np.asarray(analyzers.iq_spectrum_frames(iq, naverage=8))
        row = spec[-1]
        peak = row.argmax()
        # display order: index 127 = DC; frequency decreases with index
        # (the reference reverses both halves)
        expected_bin_offset = f / FS * 256
        center = 127
        got_offset = center - peak
        assert abs(got_offset - expected_bin_offset) <= 1, (peak, f)
        if side == "right":
            assert peak < center
        else:
            assert peak > center


def test_averaging_reduces_variance(rng):
    iq = jnp.asarray(siggen.noise(256 * 128, level=0.3))
    s1 = np.asarray(analyzers.iq_spectrum_frames(iq, naverage=1))
    s30 = np.asarray(analyzers.iq_spectrum_frames(iq, naverage=30))
    assert s30.std(axis=0).mean() < s1.std(axis=0).mean() * 0.5


def test_audio_spectrum_tone():
    n = 1024 * 64
    t = np.arange(n) / FS
    audio = np.sin(2 * np.pi * 1500.0 * t).astype(np.float32)
    spec = np.asarray(analyzers.audio_spectrum_frames(jnp.asarray(audio), naverage=8))
    peak = spec[-1].argmax()
    want = round(1500.0 / FS * 1024)
    assert abs(peak - want) <= 1


def test_smeter_law():
    """displayPeak's uv->dBuV->S-unit mapping (RDSP_display.h:329-364)."""
    # choose uv so dbuv = 20 -> s = 1 + (10+24)/6 = 6.67
    uv = jnp.asarray([10.0])
    s, plus = smeter.s_units(uv)
    np.testing.assert_allclose(float(s[0]), 1.0 + (10 + 20 * 1.2) / 6.0, rtol=1e-6)
    assert float(plus[0]) == 0.0
    # very strong: s clamps at 9 with overflow dB
    uv = jnp.asarray([10000.0])
    s, plus = smeter.s_units(uv)
    assert float(s[0]) == 9.0
    np.testing.assert_allclose(float(plus[0]), 80.0 - 34.0, rtol=1e-6)


def test_smeter_smoothing_matches_oracle(rng):
    spec = rng.uniform(0, 100, size=(20, 256)).astype(np.float32)
    uv, last = smeter.smeter_from_spectrum(jnp.asarray(spec), jnp.float32(0.0))
    want = np.zeros(20)
    old = 0.0
    for k in range(20):
        peak = abs(spec[k, 75:86].sum() / 5.0)
        old = 0.1 * (peak / 10.0) + 0.9 * old
        want[k] = old
    np.testing.assert_allclose(np.asarray(uv), want, rtol=1e-4)


def test_spectrum_smooth_matches_oracle(rng):
    spec = rng.uniform(0, 50, 256).astype(np.float32)
    old = rng.uniform(0, 50, 256).astype(np.float32)
    view, _ = display.spectrum_smooth(jnp.asarray(spec), jnp.asarray(old))
    want = np.zeros(256)
    for x in range(256):
        if 1 < x < 254:
            avg = (spec[x] * 0.7 + spec[x - 1] * 0.3 + spec[x - 2] * 0.15
                   + spec[x + 1] * 0.3 + spec[x + 2] * 0.15)
        else:
            avg = spec[x]
        want[x] = 0.7 * 2 * np.sqrt(abs(avg) * 5) + 0.3 * old[x]
    np.testing.assert_allclose(np.asarray(view), want, rtol=1e-4)


def test_waterfall_scroll_and_colors():
    hist = jnp.zeros((display.MAX_WATERFALL, 128))
    view = jnp.asarray(np.linspace(0, 100, 256).astype(np.float32))
    h1 = display.waterfall_update(hist, view)
    assert h1.shape == (50, 128)
    np.testing.assert_allclose(np.asarray(h1[0]), np.abs(np.asarray(view)[:256:2]))
    h2 = display.waterfall_update(h1, view * 0)
    np.testing.assert_allclose(np.asarray(h2[1]), np.asarray(h1[0]))
    cls = np.asarray(display.classify_waterfall_colors(h1))
    vals = np.asarray(h1[0])
    # spot-check thresholds
    assert cls[0][vals >= 75].min() == 0 if (vals >= 75).any() else True
    assert (cls[0][vals < 5] == 6).all()


def test_ascii_renderers_run():
    hist = np.random.default_rng(0).uniform(0, 80, (50, 128))
    out = display.render_waterfall_ascii(hist)
    assert len(out.splitlines()) == 50
    view = np.random.default_rng(0).uniform(0, 80, 256)
    out2 = display.render_spectrum_ascii(view)
    assert len(out2.splitlines()) == 16


def test_double_spectrum_render():
    """Update_DoubleSpectrum layout (RDSP_display.h:380-401): half panadapter
    left, AF-FFT right, labels + divider."""
    rng = np.random.default_rng(1)
    view = rng.uniform(0, 80, 256)
    audio_bins = rng.uniform(0, 20, 512)
    out = display.render_double_spectrum_ascii(view, audio_bins, height=10)
    lines = out.splitlines()
    assert lines[0].startswith("RX-SCOPE")
    assert "AF-FFT" in lines[0]
    assert len(lines) == 12  # header + rule + 10 bar rows
    # AF-FFT bar law: |bin|*5 clipped at 70 (RDSP_display.h:219-220)
    tall = display.render_audio_spectrum_ascii(np.full(512, 1e6), height=10)
    assert tall.splitlines()[0].count("|") == 101
