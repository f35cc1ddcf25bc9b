"""Round-5 SAM experiments on-chip: fast-PLL narrow kernel + wide-kernel
G/chunk sweep (VERDICT r4 #2 — config 6 vs the 2 Gs/s bar).

Measures with bench_full.py's honest methodology (device-resident inputs,
state-threaded chains, scalar-readback closure). Usage:

    python tools/bench_sam_r5.py [narrow] [wide] [ablate]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(cfg, n_channels, seg_len, reps=5, **bank_kw):
    import jax
    import jax.numpy as jnp
    from radiodsp_sdr_rx_tpu.models.fused import FusedSAMBank

    freqs = [cfg.capture_center_freq + 1_000.0 * k for k in range(n_channels)]
    bank = FusedSAMBank(cfg, freqs, **bank_kw)
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
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out, state = bank.process_planar(xr, xi, state)
        float(force(out))
        dt = min(dt, time.perf_counter() - t0)
    return n_channels * seg_len * reps / dt / 1e6


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, ReceiverConfig)

    which = set(sys.argv[1:]) or {"narrow", "wide"}
    results = {}

    def run(tag, ch, seg, **kw):
        cfg = ReceiverConfig(mode=DemodMode.SAM, vfo_freq=7_060_000.0,
                             capture_center_freq=7_050_000.0,
                             agc=AGCMode.MEDIUM)
        try:
            t0 = time.time()
            msps = bench(cfg, ch, seg, **kw)
            results[tag] = round(msps, 1)
            print(f"{tag}: {msps:.0f} Ms/s  ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"error: {str(e)[:120]}"
            print(f"{tag}: FAILED {str(e)[:200]}", file=sys.stderr, flush=True)

    if "narrow" in which:
        run("sam128_c1024", 128, 1 << 19)
        run("sam128_c2048", 128, 1 << 19, sam_chunk=2048)
    if "ablate" in which:
        # chip-measured floor decomposition of the serial PLL chain
        # (docs/PERFORMANCE.md round 5): full vs detector-stub vs skeleton
        from radiodsp_sdr_rx_tpu.ops import pallas_sam
        for det in ("stub", "skeleton"):
            pallas_sam._ABLATE_DETECTOR = det
            try:
                run(f"sam128_c2048_{det}", 128, 1 << 19, sam_chunk=2048)
                run(f"sam1024_G8_c256_{det}", 1024, 1 << 17, wide_groups=8,
                    sam_chunk=256)
            finally:
                pallas_sam._ABLATE_DETECTOR = "atan2"
    if "wide" in which:
        for g in (8, 4, 2):
            run(f"sam1024_G{g}_c256", 1024, 1 << 17, wide_groups=g,
                sam_chunk=256)
        run("sam1024_G8_c512", 1024, 1 << 17, wide_groups=8, sam_chunk=512)
        run("sam256_G2_c512", 256, 1 << 18, wide_groups=2, sam_chunk=512)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
