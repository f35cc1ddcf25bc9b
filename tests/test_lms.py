"""LMS noise reduction tests vs a NumPy transcription of the CMSIS
arm_lms_norm_f32 + reference delay-line semantics (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import lms
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def oracle_lms(x, taps, delay, mu, n_out=None):
    """Sequential oracle with the reference's first-block quirk: d = x for the
    first `delay` samples, then d[n] = x[n-delay]."""
    n = n_out or len(x)
    w = np.zeros(taps)
    win = np.zeros(taps)
    ys = np.zeros(n)
    es = np.zeros(n)
    for i in range(n):
        d = x[i] if i < delay else x[i - delay]
        win = np.concatenate([win[1:], [x[i]]])
        y = w @ win
        e = d - y
        energy = win @ win
        w = w + (mu * e / (energy + 1.1920929e-7)) * win
        ys[i] = y
        es[i] = e
    return ys, es


def test_mu_law():
    """mu mapping from RDSP_noise_reduction.h:48-56 for the menu levels."""
    for strength, want in [(20, 1.0 / 10 ** 1.2), (30, 1.0 / 10 ** 1.7),
                           (40, 1.0 / 10 ** 2.2), (50, 1.0 / 10 ** 2.7)]:
        got = float(lms.lms_mu_from_strength(strength))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_matches_sequential_oracle(rng):
    x = rng.standard_normal(600).astype(np.float32) * 0.3
    mu = 0.05
    state = lms.lms_nr_init()
    y, _ = lms.lms_nr_run(jnp.asarray(x), state, mu, mode="denoise")
    want_y, want_e = oracle_lms(x.astype(np.float64), 96, 128, mu)
    np.testing.assert_allclose(np.asarray(y), want_y, atol=2e-4)

    state = lms.lms_nr_init()
    e, _ = lms.lms_nr_run(jnp.asarray(x), state, mu, mode="notch")
    np.testing.assert_allclose(np.asarray(e), want_e, atol=2e-4)


def test_streaming_equals_batch(rng):
    x = rng.standard_normal(1024).astype(np.float32)
    mu = 0.02
    y_full, _ = lms.lms_nr_run(jnp.asarray(x), lms.lms_nr_init(), mu)
    state = lms.lms_nr_init()
    parts = []
    for seg in x.reshape(8, 128):
        y, state = lms.lms_nr_run(jnp.asarray(seg), state, mu)
        parts.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(parts), np.asarray(y_full), atol=1e-5)


def test_denoise_improves_tone_snr():
    """DNR: a tone in noise comes out with higher SNR (tone is predictable
    across the 128-sample decorrelation delay, noise is not)."""
    n = 30000
    t = np.arange(n) / FS
    tone = 0.5 * np.sin(2 * np.pi * 800.0 * t)
    noise = siggen.noise(n, level=0.25, complex_=False).astype(np.float64)
    x = (tone + noise).astype(np.float32)
    mu = float(lms.lms_mu_from_strength(30))
    y, _ = lms.lms_nr_run(jnp.asarray(x), lms.lms_nr_init(), mu)
    y = np.asarray(y)[10000:]

    def snr(sig):
        spec = np.fft.rfft(sig * np.hanning(len(sig)))
        freqs = np.fft.rfftfreq(len(sig), 1 / FS)
        tone_p = np.sum(np.abs(spec[(freqs > 700) & (freqs < 900)]) ** 2)
        noise_p = np.sum(np.abs(spec[(freqs > 1500) & (freqs < 8000)]) ** 2)
        return 10 * np.log10(tone_p / noise_p)

    assert snr(y) > snr((tone + noise)[10000:]) + 6.0  # >=6 dB improvement


def test_notch_removes_tone_keeps_noise():
    """ALS auto-notch: steady carrier removed, broadband (speech proxy) kept."""
    n = 30000
    t = np.arange(n) / FS
    tone = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    noise = siggen.noise(n, level=0.1, complex_=False).astype(np.float64)
    x = (tone + noise).astype(np.float32)
    mu = float(lms.lms_mu_from_strength(20))
    e, _ = lms.lms_nr_run(jnp.asarray(x), lms.lms_nr_init(), mu, mode="notch")
    e = np.asarray(e)[10000:]
    spec = np.abs(np.fft.rfft(e * np.hanning(len(e))))
    freqs = np.fft.rfftfreq(len(e), 1 / FS)
    tone_bin = spec[(freqs > 950) & (freqs < 1050)].max()
    in_spec = np.abs(np.fft.rfft((tone + noise)[10000:] * np.hanning(len(e))))
    tone_in = in_spec[(freqs > 950) & (freqs < 1050)].max()
    assert tone_bin < tone_in * 0.1  # >=20 dB notch
