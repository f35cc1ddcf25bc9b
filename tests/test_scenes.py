"""Crowded-band integration tests on synthetic 'recorded' scenes —
the BASELINE.json config 2/3/4 shapes, offline."""

import numpy as np
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.models.config import AGCMode, DemodMode, NRMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.metrics import analyze, scope_init
from radiodsp_sdr_rx_tpu.models.receiver import Receiver
from radiodsp_sdr_rx_tpu.utils import scenes

FS = 44117.64706


def _tone_power(audio, f, fs=FS, skip=8000, bw=80.0):
    a = np.asarray(audio, np.float64)[skip:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / fs)
    return spec[(freqs > f - bw) & (freqs < f + bw)].sum()


def test_40m_lsb_station_isolation():
    """Config 2 shape: tune each LSB station in a crowded 40 m scene; its own
    audio tones dominate and neighbors are rejected."""
    n = 1 << 17
    iq, truth = scenes.band_scene_40m_ssb(n)
    center = truth["center"]

    for name, st in truth["stations"].items():
        cfg = ReceiverConfig(mode=DemodMode.LSB, vfo_freq=st["freq"],
                             capture_center_freq=center, agc=AGCMode.MEDIUM)
        rx = Receiver(cfg)
        out, _ = rx.process(iq, rx.init_state())
        audio = np.asarray(out["audio_l"])
        own = sum(_tone_power(audio, f) for f in st["tones"][:2])
        # other stations' tone sets should be far down
        others = 0.0
        for oname, ost in truth["stations"].items():
            if oname != name:
                others += sum(_tone_power(audio, f) for f in ost["tones"][:2]
                              if all(abs(f - g) > 120 for g in st["tones"]))
        assert own > others * 10.0, (name, own, others)


def test_20m_cw_station_detection():
    """Config 3 shape: CW narrow on one pile-up station -> side-tone keyed with
    that station's envelope; a quiet frequency stays quiet."""
    n = 1 << 17
    iq, truth = scenes.band_scene_20m_cw(n)
    center = truth["center"]
    st = truth["stations"]["c1"]

    cfg = ReceiverConfig(mode=DemodMode.CW_NARROW, vfo_freq=st["freq"],
                         capture_center_freq=center, agc=AGCMode.OFF)
    rx = Receiver(cfg)
    out, _ = rx.process(iq, rx.init_state())
    audio = np.asarray(out["audio_l"], np.float64)

    # envelope of the audio correlates with the keying ground truth
    env = np.abs(audio)
    k = np.ones(256) / 256
    env_s = np.convolve(env, k, mode="same")
    key = np.convolve(st["envelope"], k, mode="same")
    c = np.corrcoef(env_s[8000:], key[8000:])[0, 1]
    assert c > 0.8, c

    # tone pitch is the 700 Hz side-tone (>10 MHz -> USB side)
    assert _tone_power(audio, 700.0) > 20 * _tone_power(audio, 1500.0)

    # a quiet spot 3 kHz off any station produces far less audio power
    quiet = Receiver(cfg.with_(vfo_freq=center + 5_500.0))
    out_q, _ = quiet.process(iq, quiet.init_state())
    assert np.var(np.asarray(out_q["audio_l"])) < 0.05 * np.var(audio)


def test_qrm_scene_notch_and_blanker():
    """Config 4 shape: QRM-corrupted SSB — the auto-notch kills the in-passband
    heterodyne; the noise blanker + DNR improve the voice SNR."""
    n = 1 << 17
    iq, truth = scenes.qrm_ssb_scene(n)
    base = ReceiverConfig(mode=DemodMode.USB, vfo_freq=truth["station_freq"],
                          capture_center_freq=truth["center"],
                          agc=AGCMode.MEDIUM)

    rx_plain = Receiver(base)
    out_p, _ = rx_plain.process(iq, rx_plain.init_state())
    audio_p = np.asarray(out_p["audio_l"])

    rx_notch = Receiver(base.with_(nr=NRMode.NOTCH))
    out_n, _ = rx_notch.process(iq, rx_notch.init_state())
    audio_n = np.asarray(out_n["audio_l"])

    het = truth["het_offset_hz"]
    # voice reference = broadband speech power away from the heterodyne
    voice_ref = _tone_power(audio_p, 600.0, bw=300.0)
    voice_ref_n = _tone_power(audio_n, 600.0, bw=300.0)
    # notch keeps the (unpredictable) speech: loses < 6 dB
    assert voice_ref_n > 0.25 * voice_ref, (voice_ref, voice_ref_n)
    # heterodyne suppressed by >= 10 dB relative to the speech
    ratio_plain = _tone_power(audio_p, het, bw=40.0) / voice_ref
    ratio_notch = _tone_power(audio_n, het, bw=40.0) / voice_ref_n
    assert ratio_notch < ratio_plain * 0.1, (ratio_plain, ratio_notch)

    # noise blanker reduces impulse energy
    rx_nb = Receiver(base.with_(noise_blanker=True))
    out_b, _ = rx_nb.process(iq, rx_nb.init_state())
    audio_b = np.asarray(out_b["audio_l"])
    peak_p = np.abs(audio_p[8000:]).max() / np.abs(audio_p[8000:]).std()
    peak_b = np.abs(audio_b[8000:]).max() / np.abs(audio_b[8000:]).std()
    assert peak_b < peak_p, (peak_p, peak_b)


def test_scene_panadapter_shows_stations():
    """The panadapter sees the scene: peaks at each station offset."""
    n = 128 * 31 * 8
    iq, truth = scenes.band_scene_40m_ssb(n)
    m, _ = analyze(jnp.asarray(iq), jnp.zeros(max((n // 512) * 512, 1024), jnp.float32),
                   scope_init())
    row = np.asarray(m["spectrum"][-1])
    for st in truth["stations"].values():
        off = st["freq"] - truth["center"]
        col = int(round(127 - off / FS * 256))
        # LSB energy sits just below the carrier; search a few bins around
        lo, hi = max(col - 4, 0), min(col + 26 if off < 0 else col + 26, 255)
        window = row[max(col - 26, 0): col + 27]
        assert window.max() > 3.0 * np.median(row), (st["freq"], window.max())
