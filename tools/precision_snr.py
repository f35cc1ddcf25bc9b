"""Measure the matmul-precision quality flag: SNR delta and throughput.

ReceiverConfig.matmul_precision trades MXU passes for accuracy in the
collapsed overlap-save / DFT operators ("highest" = full f32, "high" = 3-pass
bf16, "bf16" = 1-pass bf16). This tool quantifies the trade on the real chip:

  1. quality: residual SNR of the reduced-precision chain output vs the
     "highest" chain on a synthetic 40m USB voice scene and an AM scene
     (10*log10(|ref|^2 / |ref - x|^2));
  2. throughput: BASELINE config-4 style bank (USB + spectral subtraction,
     the most matmul-bound config) at each precision.

Run: python tools/precision_snr.py [--quick]   (results -> stdout, table is
recorded in docs/PERFORMANCE.md)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

FS = 44117.64706


def _snr_db(ref: np.ndarray, x: np.ndarray, skip: int = 4096) -> float:
    r = np.asarray(ref, np.float64)[..., skip:]
    e = r - np.asarray(x, np.float64)[..., skip:]
    return float(10.0 * np.log10(np.sum(r * r) / max(np.sum(e * e), 1e-300)))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, NRMode, ReceiverConfig)
    from radiodsp_sdr_rx_tpu.models.receiver import ReceiverBank
    from radiodsp_sdr_rx_tpu.utils import siggen

    quick = "--quick" in sys.argv
    n = 1 << (15 if quick else 17)

    # --- quality: single-channel scenes -------------------------------------
    scenes = {}
    audio_in = siggen.voice_like(n, FS)
    scenes["usb_voice"] = (
        ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_200_000.0,
                       capture_center_freq=7_190_000.0, agc=AGCMode.MEDIUM),
        siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4),
    )
    scenes["am_music"] = (
        ReceiverConfig(mode=DemodMode.AM, vfo_freq=7_060_000.0,
                       capture_center_freq=7_050_000.0, agc=AGCMode.OFF),
        siggen.am_signal(n, 10_000.0, mod_hz=1000.0, depth=0.5, fs=FS),
    )

    print("== quality (residual SNR vs matmul_precision='highest') ==")
    for name, (cfg, iq) in scenes.items():
        outs = {}
        for prec in ("highest", "high", "bf16"):
            from radiodsp_sdr_rx_tpu.models.receiver import Receiver

            rx = Receiver(cfg.with_(matmul_precision=prec))
            out, _ = rx.process(np.asarray(iq, np.complex64), rx.init_state())
            outs[prec] = np.asarray(out["audio_l"])
        for prec in ("high", "bf16"):
            print(f"{name:12s} {prec:7s}: "
                  f"{_snr_db(outs['highest'], outs[prec]):6.1f} dB residual SNR")

    # --- throughput: config-4 style spectral-subtraction bank ---------------
    print("== throughput (USB + spectral subtraction, 64 ch) ==")
    n_ch = 64
    seg = 1 << (15 if quick else 19)
    freqs = [7_190_000.0 + 1_000.0 * k for k in range(n_ch)]
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((n_ch, seg)).astype(np.float32) * .1)
    xi = jax.device_put(rng.standard_normal((n_ch, seg)).astype(np.float32) * .1)
    for prec in ("highest", "high", "bf16"):
        from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank

        cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_200_000.0,
                             capture_center_freq=7_190_000.0,
                             agc=AGCMode.MEDIUM, nr=NRMode.SPEC2,
                             matmul_precision=prec)
        bank = FusedNRBank(cfg, freqs, block_t=8192)
        state = jax.device_put(bank.init_state())
        force = jax.jit(lambda o: jnp.sum(o["audio_l"]))
        out, state = bank.process_planar(xr, xi, state)
        float(force(out))
        reps = 2 if quick else 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out, state = bank.process_planar(xr, xi, state)
        float(force(out))
        dt = time.perf_counter() - t0
        print(f"config4 {prec:7s}: {n_ch * seg * reps / dt / 1e6:7.0f} "
              f"Msamples/s/chip")
    return 0


if __name__ == "__main__":
    sys.exit(main())
