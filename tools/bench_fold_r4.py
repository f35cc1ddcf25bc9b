"""Round-4 perf experiments on the folded-NR configs (on-chip only).

Measures configs 3 (CW+notch), 4 (USB+spectral), 7 (USB+DNR2) across
matmul precision and fold chunk settings with the honest methodology of
bench_full.py. Usage:

    python tools/bench_fold_r4.py [notch|spec|lms|sam] [...]
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
    from radiodsp_sdr_rx_tpu.models.fused import (
        FusedNRBank, FusedSAMBank)
    from radiodsp_sdr_rx_tpu.models.config import DemodMode

    freqs = [cfg.capture_center_freq + 1_000.0 * k for k in range(n_channels)]
    if cfg.mode == DemodMode.SAM:
        bank = FusedSAMBank(cfg, freqs, **bank_kw)
    else:
        bank = FusedNRBank(cfg, freqs, **bank_kw)
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
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, NRMode, ReceiverConfig)

    which = set(sys.argv[1:]) or {"notch", "spec", "lms"}
    seg = 1 << 19
    results = {}

    def run(tag, cfg, ch, **kw):
        try:
            t0 = time.time()
            msps = bench(cfg, ch, seg, **kw)
            results[tag] = round(msps, 1)
            print(f"{tag}: {msps:.0f} Ms/s  ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            results[tag] = f"error: {str(e)[:120]}"
            print(f"{tag}: FAILED {str(e)[:200]}", file=sys.stderr, flush=True)

    if "notch" in which:
        for prec in ("highest", "high"):
            cfg = ReceiverConfig(
                mode=DemodMode.CW_NARROW, vfo_freq=14_050_000.0,
                capture_center_freq=14_049_000.0, agc=AGCMode.FAST,
                nr=NRMode.NOTCH, matmul_precision=prec)
            for ck in (1024, 2048, 4096):
                run(f"notch128_{prec}_c{ck}", cfg, 128, fold_chunk=ck)
    if "lms" in which:
        for prec in ("highest", "high"):
            cfg = ReceiverConfig(
                mode=DemodMode.USB, vfo_freq=7_200_000.0,
                capture_center_freq=7_190_000.0, agc=AGCMode.MEDIUM,
                nr=NRMode.DNR2, matmul_precision=prec)
            for ck in (1024, 2048, 4096):
                run(f"lms128_{prec}_c{ck}", cfg, 128, fold_chunk=ck)
    if "spec" in which:
        for prec in ("highest", "high"):
            cfg = ReceiverConfig(
                mode=DemodMode.USB, vfo_freq=7_200_000.0,
                capture_center_freq=7_190_000.0, agc=AGCMode.MEDIUM,
                nr=NRMode.SPEC2, matmul_precision=prec)
            run(f"spec64_{prec}_b4096", cfg, 64, block_t=4096)
            run(f"spec64_{prec}_b8192", cfg, 64, block_t=8192)
            run(f"spec128_{prec}_b8192", cfg, 128, block_t=8192)
    if "sam" in which:
        for prec in ("highest", "high"):
            cfg = ReceiverConfig(
                mode=DemodMode.SAM, vfo_freq=7_060_000.0,
                capture_center_freq=7_050_000.0, agc=AGCMode.MEDIUM,
                matmul_precision=prec)
            run(f"sam128_{prec}_c1024", cfg, 128)
            run(f"sam128_{prec}_c2048", cfg, 128, sam_chunk=2048)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
