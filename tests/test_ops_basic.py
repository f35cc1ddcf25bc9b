"""Unit tests: q15 round-trip, NCO, AGC, IIR/biquad, noise blanker,
preprocessor — each against an independent NumPy oracle (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radiodsp_sdr_rx_tpu.ops import agc as agc_ops
from radiodsp_sdr_rx_tpu.ops import iir, nco, preprocessor, qformat
from radiodsp_sdr_rx_tpu.ops.noise_blanker import noise_blanker
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


# ---------- q15 ----------

def test_q15_roundtrip_matches_cmsis_semantics():
    f = jnp.asarray([0.0, 0.5, -0.5, 0.999999, -1.0, 1.0, 2.0, -2.0, 1e-5])
    q = np.asarray(qformat.float_to_q15(f))
    # trunc toward zero + saturation
    want = np.clip(np.trunc(np.asarray(f) * 32768.0), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(q, want)
    back = np.asarray(qformat.q15_to_float(jnp.asarray(q)))
    np.testing.assert_allclose(back, np.asarray(q, np.float32) / 32768.0)


# ---------- NCO ----------

def test_nco_mixes_carrier_to_dc():
    n = 8192
    f = 10_000.0
    x = jnp.asarray(siggen.carrier(n, f, FS, amp=1.0))
    inc = nco.freq_to_phase_inc(f, FS)
    y, _ = nco.nco_mix(x, jnp.uint32(0), inc)
    y = np.asarray(y)
    # after mixing down the result should be ~constant (DC)
    assert np.std(y.real) < 1e-3 and np.std(y.imag) < 1e-3
    np.testing.assert_allclose(np.abs(y), 1.0, atol=1e-3)


def test_nco_phase_continuity_across_segments():
    n = 4096
    f = 1234.5
    x = jnp.asarray(siggen.carrier(2 * n, f, FS, amp=1.0))
    inc = nco.freq_to_phase_inc(f, FS)
    y_full, _ = nco.nco_mix(x, jnp.uint32(0), inc)
    y1, ph = nco.nco_mix(x[:n], jnp.uint32(0), inc)
    y2, _ = nco.nco_mix(x[n:], ph, inc)
    np.testing.assert_allclose(
        np.asarray(y_full), np.concatenate([np.asarray(y1), np.asarray(y2)]), atol=1e-5
    )


def test_nco_no_drift_long_stream():
    """uint32 accumulator: phase after 1M samples is exact."""
    inc = nco.freq_to_phase_inc(7000.0, FS)
    ph = nco.nco_phase_advance(jnp.uint32(0), inc, 1_000_000)
    want = (int(np.asarray(inc)) * 1_000_000) % (2**32)
    assert int(np.asarray(ph)) == want


# ---------- AGC ----------

def agc_envelope_oracle(mag, env0, release):
    env = np.empty_like(mag)
    e = env0
    for i, m in enumerate(mag):
        e = max(m, e * release)
        env[i] = e
    return env


@pytest.mark.parametrize("n", [100, 5000, 40000])
def test_agc_envelope_matches_sequential_oracle(rng, n):
    mag = np.abs(rng.standard_normal(n)).astype(np.float32)
    release = 0.9996
    env, last = agc_ops.agc_envelope(jnp.asarray(mag), jnp.float32(0.5), release)
    want = agc_envelope_oracle(mag.astype(np.float64), 0.5, release)
    np.testing.assert_allclose(np.asarray(env), want, rtol=2e-4)
    np.testing.assert_allclose(float(last), want[-1], rtol=2e-4)


def test_agc_levels_output(rng):
    """A loud then quiet tone should come out near target level after decay."""
    params = agc_ops.agc_presets(FS)["fast"]
    n = 120000
    t = np.arange(n) / FS
    x = np.sin(2 * np.pi * 600 * t).astype(np.float32)
    x[:20000] *= 0.9
    x[20000:] *= 0.01
    y, _ = agc_ops.agc_run(jnp.asarray(x), params, jnp.float32(1e-6))
    y = np.asarray(y)
    assert 0.3 < np.abs(y[5000:15000]).max() < 0.7
    # after ~2.3 s of quiet (>> 0.25 s release) gain recovers toward target
    assert np.abs(y[n - 10000 :]).max() > 0.25


def test_agc_off_passthrough(rng):
    params = agc_ops.agc_presets(FS)["off"]
    x = rng.standard_normal(1000).astype(np.float32)
    y, _ = agc_ops.agc_run(jnp.asarray(x), params, jnp.float32(1e-6))
    np.testing.assert_array_equal(np.asarray(y), x)


# ---------- IIR ----------

def test_first_order_iir_matches_oracle(rng):
    x = rng.standard_normal(500).astype(np.float32)
    a, b, y0 = 0.95, 0.05, 0.3
    y, last = iir.first_order_iir(jnp.asarray(x), a, b, jnp.float32(y0))
    want = np.empty(500)
    acc = y0
    for i in range(500):
        acc = a * acc + b * x[i]
        want[i] = acc
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(last), want[-1], rtol=1e-4)


def test_dc_blocker_removes_dc(rng):
    x = (rng.standard_normal(20000) * 0.1 + 5.0).astype(np.float32)
    y, _ = iir.dc_blocker(jnp.asarray(x), jnp.zeros(2, jnp.float32))
    assert abs(np.mean(np.asarray(y)[5000:])) < 0.01


def test_biquad_highpass_response():
    """500 Hz HPF (panadapter pre-filter, ino:155): rejects 50 Hz, passes 5 kHz."""
    c = iir.biquad_highpass(500.0, FS, 0.5)
    n = 20000
    t = np.arange(n) / FS
    for freq, expect_pass in [(50.0, False), (5000.0, True)]:
        x = np.sin(2 * np.pi * freq * t).astype(np.float32)
        y, _ = iir.biquad_apply(jnp.asarray(x), c, jnp.zeros(2, jnp.float32))
        amp = np.abs(np.asarray(y)[n // 2 :]).max()
        assert amp > 0.7 if expect_pass else amp < 0.05


def test_biquad_scan_matches_oracle(rng):
    c = iir.biquad_highpass(500.0, FS, 0.5)
    x = rng.standard_normal(300).astype(np.float32)
    y, _ = iir.biquad_apply(jnp.asarray(x), c, jnp.zeros(2, jnp.float32))
    # direct-form-I oracle
    want = np.zeros(300)
    x1 = x2 = y1 = y2 = 0.0
    for i in range(300):
        yy = c.b0 * x[i] + c.b1 * x1 + c.b2 * x2 - c.a1 * y1 - c.a2 * y2
        want[i] = yy
        x2, x1 = x1, x[i]
        y2, y1 = y1, yy
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


# ---------- noise blanker ----------

def test_noise_blanker_removes_impulses(rng):
    x = siggen.carrier(8192, 1000.0, FS, amp=0.1)
    x[1000] += 5.0
    x[5000] += 5.0j
    y, _ = noise_blanker(jnp.asarray(x), jnp.float32(0.1), threshold_db=10.0)
    y = np.asarray(y)
    assert np.abs(y[1000]) < 0.2 and np.abs(y[5000]) < 0.2
    # non-impulse region survives
    assert np.abs(y[2000:4000]).mean() > 0.05


# ---------- preprocessor ----------

def test_iq_gain_balance():
    x = jnp.asarray(np.array([1 + 1j, 2 - 2j], np.complex64))
    y = np.asarray(preprocessor.iq_gain_balance(x, 1.020))
    np.testing.assert_allclose(y.imag, [1.020, -2.040], rtol=1e-6)
    np.testing.assert_allclose(y.real, [1.0, 2.0])


@pytest.mark.parametrize("fault", [0, 1, 2, 3])
def test_iq_error_detect_and_repair(fault):
    """Inject swap/slip faults; the detector must pick the right repair and the
    repaired stream must recover strong spectral asymmetry."""
    clean = siggen.carrier(4096, 5000.0, FS, amp=0.5) + siggen.noise(4096, 0.01)
    i, q = clean.real, clean.imag
    if fault == 0:
        corrupted = clean
    elif fault == 1:  # swapped
        corrupted = (q + 1j * i).astype(np.complex64)
    elif fault == 2:  # I advanced by one (repair = delay I)
        i2 = np.concatenate([i[1:], i[-1:]])
        corrupted = (i2 + 1j * q).astype(np.complex64)
    else:  # Q advanced by one
        q2 = np.concatenate([q[1:], q[-1:]])
        corrupted = (i + 1j * q2).astype(np.complex64)
    fixed = preprocessor.repair_iq(
        jnp.asarray(corrupted), preprocessor.detect_iq_error(jnp.asarray(corrupted))
    )
    asym = float(preprocessor.spectral_asymmetry(fixed))
    assert asym > 0.95


def _sir_1k_vs_2k(audio):
    """Signal (1 kHz wanted) to interference (2 kHz image leak) ratio, dB."""
    a = np.asarray(audio)[4000:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / FS)
    sig = spec[np.abs(freqs - 1000.0) < 40.0].sum()
    imq = spec[np.abs(freqs - 2000.0) < 40.0].sum()
    return 10 * np.log10(sig / max(imq, 1e-30))


@pytest.mark.parametrize("fault", [2, 3])
def test_auto_iq_repair_end_to_end(fault):
    """Live-path wiring of the reference's boot-time I2S slip repair
    (startAutoI2SerrorDetection, RadioDSP_SDR_RX.ino:117): a one-sample
    I2S slip breaks quadrature and lets a strong image-frequency carrier
    leak into the channel; auto_iq_repair=True detects the slip on the
    first segment, locks it, and restores image rejection — streaming-
    consistent across segments."""
    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, ReceiverConfig,
    )
    from radiodsp_sdr_rx_tpu.models.receiver import Receiver

    n = 1 << 15
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.2)
    # strong carrier at -12 kHz: under a slip it leaks to +12 kHz, which
    # demodulates to an in-channel 2 kHz tone (vfo at center + 10 kHz)
    iq = iq + siggen.carrier(n, -12_000.0, FS, amp=0.6)
    iq = (iq + siggen.noise(n, 0.002)).astype(np.complex64)
    if fault == 2:   # I advanced one sample -> repair = delay I
        i2 = np.concatenate([iq.real[1:], iq.real[-1:]])
        corrupted = (i2 + 1j * iq.imag).astype(np.complex64)
    else:            # Q advanced one sample -> repair = delay Q
        q2 = np.concatenate([iq.imag[1:], iq.imag[-1:]])
        corrupted = (iq.real + 1j * q2).astype(np.complex64)

    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.OFF)
    rx_off = Receiver(cfg)
    out_bad, _ = rx_off.process(corrupted, rx_off.init_state())
    rx_on = Receiver(cfg.with_(auto_iq_repair=True))
    st = rx_on.init_state()
    out1, st = rx_on.process(corrupted[: n // 2], st)
    out2, _ = rx_on.process(corrupted[n // 2:], st)
    fixed = np.concatenate([np.asarray(out1["audio_l"]),
                            np.asarray(out2["audio_l"])])
    assert rx_on.iq_repair_idx == fault
    sir_bad = _sir_1k_vs_2k(out_bad["audio_l"])
    sir_fixed = _sir_1k_vs_2k(fixed)
    assert sir_fixed > sir_bad + 15.0, (sir_bad, sir_fixed)
    assert sir_fixed > 30.0

    # streaming consistency: split processing == one-shot processing
    rx_once = Receiver(cfg.with_(auto_iq_repair=True))
    out_full, _ = rx_once.process(corrupted, rx_once.init_state())
    np.testing.assert_allclose(fixed, np.asarray(out_full["audio_l"]),
                               atol=1e-5)


def test_manual_swap_iq():
    """preProcessor.swapIQ as a manual config (the reference ships the call
    commented out, RadioDSP_SDR_RX.ino:118): demodulating a swapped capture
    with swap_iq=True reproduces the clean capture's output exactly."""
    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, ReceiverConfig,
    )
    from radiodsp_sdr_rx_tpu.models.receiver import Receiver

    n = 1 << 14
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    swapped = (iq.imag + 1j * iq.real).astype(np.complex64)

    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.OFF)
    rx = Receiver(cfg)
    out_clean, _ = rx.process(iq.astype(np.complex64), rx.init_state())
    rx_sw = Receiver(cfg.with_(swap_iq=True))
    out_fixed, _ = rx_sw.process(swapped, rx_sw.init_state())
    np.testing.assert_allclose(np.asarray(out_fixed["audio_l"]),
                               np.asarray(out_clean["audio_l"]), atol=1e-6)


def test_auto_iq_repair_midstream_slip():
    """VERDICT r4 #5: the reference's detector runs PERSISTENTLY
    (startAutoI2SerrorDetection in the ISR graph) — a slip that happens
    MID-STREAM must be caught. Segments 0-4 are aligned; from segment 5 the
    I channel slips one sample. With hysteresis 3 the repair must switch by
    segment 7 and the image rejection must recover."""
    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, ReceiverConfig,
    )
    from radiodsp_sdr_rx_tpu.models.receiver import Receiver

    seg = 1 << 13
    n_seg = 10
    n = seg * n_seg
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.2)
    iq = iq + siggen.carrier(n, -12_000.0, FS, amp=0.6)
    iq = (iq + siggen.noise(n, 0.002)).astype(np.complex64)
    # the slip starts at segment 5: I advances one sample from there on
    slip_at = 5 * seg
    i2 = np.concatenate([iq.real[:slip_at], iq.real[slip_at + 1 :],
                         iq.real[-1:]])
    corrupted = (i2 + 1j * iq.imag).astype(np.complex64)

    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.OFF,
                         auto_iq_repair=True)
    rx = Receiver(cfg)
    st = rx.init_state()
    outs, idxs = [], []
    for k in range(n_seg):
        o, st = rx.process(corrupted[k * seg : (k + 1) * seg], st)
        outs.append(np.asarray(o["audio_l"]))
        idxs.append(rx.iq_repair_idx)
    # pre-slip: aligned; the switch lands after the 3-segment hysteresis
    assert idxs[4] == 0, idxs
    assert idxs[7] == 2, idxs          # delay-I repair adopted
    # audio recovers: image rejection in the final segments ~ pre-slip level
    sir_pre = _sir_1k_vs_2k(np.concatenate(outs[2:5]))
    sir_during = _sir_1k_vs_2k(np.concatenate(outs[5:7]))
    sir_post = _sir_1k_vs_2k(np.concatenate(outs[8:]))
    assert sir_post > sir_during + 10.0, (sir_pre, sir_during, sir_post)
    assert sir_post > 30.0
