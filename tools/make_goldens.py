"""Generate the golden-capture regression fixtures (VERDICT r1 #4).

BASELINE.json's correctness target is "matches the reference within its SNR
bound on recorded IQ captures (40 m SSB, 20 m CW)". No recorded captures can
be shipped, so the deterministic synthetic scenes in utils/scenes.py stand in
(same seeds every run); this script demodulates them with the CPU Receiver
chain and commits the outputs + achieved quality metrics as goldens that
tests/test_golden_captures.py asserts against.

Run on CPU (the conftest platform) so the goldens are hermetic:
    JAX_PLATFORMS=cpu python tools/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _hilbert(x: np.ndarray) -> np.ndarray:
    """Imaginary part of the analytic signal (FFT Hilbert transform)."""
    n = len(x)
    spec = np.fft.fft(x)
    h = np.zeros(n)
    h[0] = 1.0
    h[1:(n + 1) // 2] = 2.0
    if n % 2 == 0:
        h[n // 2] = 1.0
    return np.fft.ifft(spec * h).imag


def aligned_snr_db(out: np.ndarray, ref: np.ndarray, max_lag: int = 512,
                   skip: int = 4000) -> float:
    """SNR of `out` against the ground-truth `ref` after gain/lag/phase
    alignment.

    SSB demodulation recovers the audio up to a constant carrier-phase
    rotation of its analytic signal (out = cos(phi)*ref - sin(phi)*H(ref) —
    true of the reference hardware too, since the QSD LO phase is arbitrary),
    so the fit regresses on BOTH quadratures [ref, hilbert(ref)] at the best
    integer lag and reports 10log10(signal/residual).
    """
    o = np.asarray(out, np.float64)[skip:]
    r = np.asarray(ref, np.float64)[skip:]
    n = min(len(o), len(r)) - max_lag - 16
    r0 = r[:n]
    h0 = _hilbert(r[:n])
    two = np.stack([r0, h0], axis=1)
    gram_inv = np.linalg.inv(two.T @ two)
    best, best_lag = -np.inf, 8
    for lag in range(0, max_lag):
        seg = o[lag:lag + n]
        b = two.T @ seg
        c = (b @ gram_inv @ b) / (np.dot(seg, seg) + 1e-30)
        if c > best:
            best, best_lag = c, lag
    # refine with a short two-quadrature equalizer (+-8 taps) around the best
    # lag — absorbs the fractional group delay / mild passband dispersion the
    # chain's quirk-faithful FIRs introduce (they are part of the spec, not
    # noise)
    cols = []
    for dlag in range(-8, 9):
        cols.append(r[8 + dlag: 8 + dlag + n])
        cols.append(_hilbert(r[8 + dlag: 8 + dlag + n]))
    basis = np.stack(cols, axis=1)                      # (n, 34)
    seg = o[best_lag:best_lag + n]
    coef, *_ = np.linalg.lstsq(basis, seg, rcond=None)
    fit = basis @ coef
    resid = seg - fit
    return float(10.0 * np.log10(
        np.dot(fit, fit) / max(np.dot(resid, resid), 1e-30)))


def envelope_corr(out: np.ndarray, env_ref: np.ndarray, fs: float,
                  tau_s: float = 0.005, skip: int = 4000) -> float:
    """Correlation of |out| (smoothed) with a keying ground-truth envelope."""
    a = np.exp(-1.0 / (tau_s * fs))
    env = np.abs(np.asarray(out, np.float64))
    y = np.empty_like(env)
    acc = 0.0
    for i, v in enumerate(env):
        acc = a * acc + (1 - a) * v
        y[i] = acc
    y = y[skip:]
    r = np.asarray(env_ref, np.float64)[skip:len(y) + skip]
    y = y - y.mean()
    r = r - r.mean()
    return float(np.dot(y, r) / (np.linalg.norm(y) * np.linalg.norm(r) + 1e-30))


def segmental_metrics(out: np.ndarray, ref: np.ndarray, fs: float,
                      skip: int = 4096) -> dict:
    """NR-effectiveness metrics on a voiced scene (round 4 / VERDICT r3 #5).

    The reference's spectral engine cannot improve a WAVEFORM-regression SNR:
    its floor estimate (stopband-mean x nr_level x 1.5, with rectangular-
    frame leakage) attenuates low-magnitude speech content along with noise
    (measured: SPEC2 on the voiced scene lowers aligned_snr_db 17 -> 8 dB at
    every input SNR, while audibly lowering the noise floor). What the
    engine DOES deliver — and what these metrics gate — is segmental:
    noise in speech PAUSES is suppressed (~6 dB) more than voiced-segment
    energy, so the noise-corrected voiced-to-pause ratio improves (~+1 dB).
    Masks come from the ground-truth syllable envelope.

      seg_db:    20*log10(sqrt(voiced_rms^2 - pause_rms^2) / pause_rms)
      pause_rms: absolute pause-noise floor
      snr_db:    aligned waveform SNR (speech-survival floor, not an
                 improvement gate)
    """
    env = np.abs(np.asarray(ref, np.float64))
    k = np.hanning(801)
    k /= k.sum()
    sm = np.convolve(env, k, mode="same")
    pause = sm < 0.02 * sm.max()
    voiced = sm > 0.08 * sm.max()
    a = np.asarray(out, np.float64)[skip:]
    p = pause[skip:skip + len(a)]
    v = voiced[skip:skip + len(a)]
    prms = float(np.sqrt(np.mean(a[p] ** 2)))
    vrms = float(np.sqrt(np.mean(a[v] ** 2)))
    net = np.sqrt(max(vrms ** 2 - prms ** 2, 1e-20))
    return {
        "seg_db": float(20.0 * np.log10(net / max(prms, 1e-12))),
        "pause_rms": prms,
        "snr_db": aligned_snr_db(out, ref),
    }


def heterodyne_db(out: np.ndarray, het_hz: float, fs: float,
                  skip: int = 4000, width_hz: float = 30.0,
                  band=(300.0, 2800.0)) -> float:
    """Residual heterodyne power at ``het_hz`` relative to the mean voice-band
    PSD, in dB (0 dB == the tone is level with the speech floor)."""
    a = np.asarray(out, np.float64)[skip:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / fs)
    tone = spec[np.abs(freqs - het_hz) < width_hz].max()
    voice = spec[(freqs >= band[0]) & (freqs <= band[1])]
    return float(10.0 * np.log10(tone / max(voice.mean(), 1e-30)))


def build_cases(n: int = 1 << 16):
    """The three golden scenes -> (name, cfg, iq, metrics_fn)."""
    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, NRMode, ReceiverConfig)
    from radiodsp_sdr_rx_tpu.utils import scenes

    FS = scenes.FS
    cases = []

    # AGC OFF for the fidelity cases: the SNR metric fits one static scale,
    # and a time-varying AGC gain (correct behavior) would read as "noise"
    iq40, truth40 = scenes.band_scene_40m_ssb(n)
    s2 = truth40["stations"]["s2"]
    cfg40 = ReceiverConfig(
        mode=DemodMode.LSB, vfo_freq=s2["freq"],
        capture_center_freq=truth40["center"], agc=AGCMode.OFF)
    cases.append(("ssb40m_s2", cfg40, iq40,
                  lambda audio: {"snr_db": aligned_snr_db(audio, s2["audio"])}))

    iqcw, truthcw = scenes.band_scene_20m_cw(n)
    c1 = truthcw["stations"]["c1"]
    cfgcw = ReceiverConfig(
        mode=DemodMode.CW_NARROW, vfo_freq=c1["freq"],
        capture_center_freq=truthcw["center"], agc=AGCMode.OFF)
    cases.append(("cw20m_c1", cfgcw, iqcw,
                  lambda audio: {"env_corr": envelope_corr(
                      audio, c1["envelope"], FS)}))

    iqq, truthq = scenes.qrm_ssb_scene(n)
    cfgq = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=truthq["station_freq"],
        capture_center_freq=truthq["center"], agc=AGCMode.OFF,
        nr=NRMode.SPEC2)

    # NOTE: the absolute SNR here is low by construction — the scene's
    # "speech" is band-limited noise, which spectral subtraction cannot
    # separate from channel noise (the reference engine has the same
    # behavior). The golden metric is a drift detector, not a quality claim;
    # NR effectiveness proper is asserted in tests/test_scenes.py.
    cases.append(("qrm_usb_spec2", cfgq, iqq,
                  lambda audio: {"snr_db": aligned_snr_db(
                      audio, truthq["audio"])}))

    # notch-under-QRM: the ALS auto-notch (RDSP_controls.h:257-262) against
    # the scene's in-passband heterodyne. Quality metrics: aligned SNR and
    # heterodyne rejection (power at het_offset relative to the voice band).
    cfgn = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=truthq["station_freq"],
        capture_center_freq=truthq["center"], agc=AGCMode.OFF,
        nr=NRMode.NOTCH)
    het = truthq["het_offset_hz"]
    cases.append(("qrm_usb_notch", cfgn, iqq,
                  lambda audio: {
                      "snr_db": aligned_snr_db(audio, truthq["audio"]),
                      "het_db": heterodyne_db(audio, het, FS)}))

    # voiced-speech scene (round 4): harmonic speech with PAUSES, so the
    # spectral engine's VAD floor can lock onto channel noise and the gate
    # can assert NR IMPROVES the segmental ratio (see segmental_metrics)
    iqv, truthv = scenes.voiced_qrm_scene(n)
    cfgv = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=truthv["station_freq"],
        capture_center_freq=truthv["center"], agc=AGCMode.OFF,
        nr=NRMode.SPEC2)
    cases.append(("voiced_usb_spec2", cfgv, iqv,
                  lambda audio: segmental_metrics(audio, truthv["audio"], FS)))

    # fading/Doppler + atmospheric-noise scene (round 5, VERDICT r4 #9):
    # two-path Watterson-style channel with static crashes, demodulated with
    # the noise blanker ON. A static-gain SNR fit cannot follow fading, so
    # the quality metric tracks the output loudness envelope against
    # fade_env x the speech's syllabic envelope.
    iqf, truthf = scenes.fading_ssb_scene(n)
    cfgf = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=truthf["station_freq"],
        capture_center_freq=truthf["center"], agc=AGCMode.OFF,
        noise_blanker=True)
    env_audio = np.abs(truthf["audio"]).astype(np.float64)
    a_env = np.exp(-1.0 / (0.01 * FS))
    sy = np.empty_like(env_audio)
    acc = 0.0
    for i, v in enumerate(env_audio):
        acc = a_env * acc + (1 - a_env) * v
        sy[i] = acc
    fade_ref = truthf["fade_env"] * sy
    cases.append(("fading_usb_nb", cfgf, iqf,
                  lambda audio: {"env_corr": envelope_corr(
                      audio, fade_ref, FS, tau_s=0.01)}))
    return cases


def main():
    import jax

    assert jax.default_backend() == "cpu", (
        "goldens must be generated on the hermetic CPU backend "
        "(run under the tests/ conftest platform or JAX_PLATFORMS=cpu)")
    from radiodsp_sdr_rx_tpu.models.receiver import Receiver

    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens")
    os.makedirs(outdir, exist_ok=True)
    keep = 32768   # committed audio snippet length

    only = set(sys.argv[1:])   # optional case-name filter
    for name, cfg, iq, metrics_fn in build_cases():
        if only and name not in only:
            continue
        rx = Receiver(cfg)
        out, _ = rx.process(iq, rx.init_state())
        audio = np.asarray(out["audio_l"])
        metrics = metrics_fn(audio)
        np.savez_compressed(
            os.path.join(outdir, f"{name}.npz"),
            audio_l=audio[:keep].astype(np.float32),
            **{k: np.float64(v) for k, v in metrics.items()})
        print(f"{name}: {metrics}")


if __name__ == "__main__":
    main()
