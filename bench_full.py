"""Extended benchmark suite (not driver-run; see bench.py for the headline).

Covers the BASELINE.json staged configs on one chip with honest timing
(device-resident inputs, data-dependent chains, scalar-readback closure):

  1. AM envelope demod, single logical config (run as a bank for utilization)
  2. USB chain, 128-channel bank (the headline)
  3. CW narrow + auto-notch (LMS scan path)
  4. Full chain + spectral subtraction, 64 channels
  5'. 1024-channel bank on ONE chip (config 5's bank at single-chip scale;
      the multi-host version needs a pod slice)

Usage: python bench_full.py [--quick]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


FS = 44117.64706


def _make_bank(cfg, freqs):
    """Fastest applicable backend per config (mirrors what a user would run):
    sweep-kernel fused banks where they exist, the XLA bank otherwise."""
    from radiodsp_sdr_rx_tpu.models.config import DemodMode
    from radiodsp_sdr_rx_tpu.models.fused import (
        FusedAMBank, FusedNRBank, FusedSAMBank, FusedSSBBank)
    from radiodsp_sdr_rx_tpu.models.receiver import ReceiverBank

    try:
        if cfg.nr.kind == "off":
            if cfg.mode == DemodMode.AM:
                return FusedAMBank(cfg, freqs, block_t=8192), "sweep-am"
            if cfg.mode == DemodMode.SAM:
                return FusedSAMBank(cfg, freqs), "sweep-sam"
            return FusedSSBBank(cfg, freqs, block_t=16384), "sweep"
        # round 4: EVERY mode x NR combo folds (AM/SAM via the lanes
        # kernel; ssb+spectral via the ch-major spec kernel, no ceiling)
        tag = {DemodMode.AM: "am", DemodMode.SAM: "sam"}.get(cfg.mode, "")
        return (FusedNRBank(cfg, freqs, block_t=8192),
                f"sweep{'-' + tag if tag else ''}+{cfg.nr.kind}")
    except ValueError:
        backend = "batched" if (cfg.nr.kind in ("lms", "notch")
                                and len(freqs) == 128) else "vmap"
        return ReceiverBank(cfg, freqs, backend=backend), f"xla-{backend}"


def _bench_bank(cfg, n_channels, seg_len, reps=5):
    import jax
    import jax.numpy as jnp

    freqs = [cfg.capture_center_freq + 1_000.0 * k for k in range(n_channels)]
    bank, path = _make_bank(cfg, freqs)
    print(f"  path: {path}", file=sys.stderr)
    state = jax.device_put(bank.init_state())
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((n_channels, seg_len))
                        .astype(np.float32) * 0.1)
    xi = jax.device_put(rng.standard_normal((n_channels, seg_len))
                        .astype(np.float32) * 0.1)
    force = jax.jit(lambda o: jnp.sum(o["audio_l"]))

    out, state = bank.process_planar(xr, xi, state)
    checksum = float(force(out))
    assert np.isfinite(checksum), "non-finite output"
    # best of 3 windows: the first window after a relay-idle period can run
    # ~2x slow (same rationale as bench.py)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out, state = bank.process_planar(xr, xi, state)
        float(force(out))
        dt = min(dt, time.perf_counter() - t0)
    return n_channels * seg_len * reps / dt / 1e6, path


def main() -> int:
    quick = "--quick" in sys.argv
    import os

    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, NRMode, ReceiverConfig,
    )

    seg = 1 << (17 if quick else 19)
    scenarios = {
        # tuned block_t=16384 (matches the bench.py headline measurement)
        "config2_usb_128ch": ReceiverConfig(
            mode=DemodMode.USB, vfo_freq=7_200_000.0,
            capture_center_freq=7_190_000.0, agc=AGCMode.MEDIUM),
        "config3_cw_notch_128ch": ReceiverConfig(
            mode=DemodMode.CW_NARROW, vfo_freq=14_050_000.0,
            capture_center_freq=14_049_000.0, agc=AGCMode.FAST,
            nr=NRMode.NOTCH),
        "config4_spec_nr_64ch": ReceiverConfig(
            mode=DemodMode.USB, vfo_freq=7_200_000.0,
            capture_center_freq=7_190_000.0, agc=AGCMode.MEDIUM,
            nr=NRMode.SPEC2),
        "config5_1024ch_bank": ReceiverConfig(
            mode=DemodMode.USB, vfo_freq=7_200_000.0,
            capture_center_freq=7_190_000.0, agc=AGCMode.MEDIUM),
        # beyond the BASELINE five: the two remaining engines
        "config6_sam_128ch": ReceiverConfig(
            mode=DemodMode.SAM, vfo_freq=7_060_000.0,
            capture_center_freq=7_050_000.0, agc=AGCMode.MEDIUM),
        "config7_usb_dnr2_128ch": ReceiverConfig(
            mode=DemodMode.USB, vfo_freq=7_200_000.0,
            capture_center_freq=7_190_000.0, agc=AGCMode.MEDIUM,
            nr=NRMode.DNR2),
        # round 4: AM x NR on the folded lanes kernel (VERDICT r3 #3)
        "config8_am_dnr2_128ch": ReceiverConfig(
            mode=DemodMode.AM, vfo_freq=7_060_000.0,
            capture_center_freq=7_050_000.0, agc=AGCMode.MEDIUM,
            nr=NRMode.DNR2),
        # round 5: noise blanker folded into the sweep kernel (VERDICT r4 #4)
        "config9_usb_nb_128ch": ReceiverConfig(
            mode=DemodMode.USB, vfo_freq=7_200_000.0,
            capture_center_freq=7_190_000.0, agc=AGCMode.MEDIUM,
            noise_blanker=True),
        # round 5: 1024-ch SAM bank on the G=8 sublane-wide PLL kernel
        "config10_sam_1024ch": ReceiverConfig(
            mode=DemodMode.SAM, vfo_freq=7_060_000.0,
            capture_center_freq=7_050_000.0, agc=AGCMode.MEDIUM),
        # LAST: this round's sweep-am compile is slow/hang-prone on the
        # relay; ordering it last keeps one bad compile from starving the
        # whole artifact
        "config1_am_64ch": ReceiverConfig(
            mode=DemodMode.AM, vfo_freq=7_060_000.0,
            capture_center_freq=7_050_000.0, agc=AGCMode.OFF),
    }
    channels = {"config1_am_64ch": 64, "config2_usb_128ch": 128,
                "config3_cw_notch_128ch": 128, "config4_spec_nr_64ch": 64,
                "config5_1024ch_bank": 1024, "config6_sam_128ch": 128,
                "config7_usb_dnr2_128ch": 128, "config8_am_dnr2_128ch": 128,
                "config9_usb_nb_128ch": 128, "config10_sam_1024ch": 1024}
    # config5 keeps a shorter segment only to bound HBM (1024 ch x 2 planes);
    # the adaptive-engine configs use the full segment — per-call dispatch
    # through the relay costs ~7 ms, so short segments under-report the
    # kernel's sustained rate (tools/tune_fold.py: notch 509 Ms/s at 2^16 vs
    # 1640 Ms/s at 2^19 for the SAME kernel)
    seg_override = {"config5_1024ch_bank": 1 << 16,
                    "config10_sam_1024ch": 1 << 17}

    results = {}
    for name, cfg in scenarios.items():
        try:
            msps, path = _bench_bank(cfg, channels[name],
                                     seg_override.get(name, seg),
                                     reps=2 if quick else 5)
            results[name] = {"msps": round(msps, 1), "path": path}
            print(f"{name}: {msps:.0f} Msamples/s/chip ({path})",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            results[name] = f"error: {str(e)[:80]}"
            print(f"{name}: FAILED {e}", file=sys.stderr)

    line = json.dumps(results)
    print(line)
    for a in sys.argv[1:]:     # --out=FILE: committed per-round artifact
        if a.startswith("--out="):
            with open(a[len("--out="):], "w") as f:
                f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
