"""Tune the folded lanes-chain kernel parameters on the real chip.

Times FusedNRBank (notch / lms) and FusedSAMBank across fold_chunk /
fold_group settings plus the staged (fold=False) path, honest chained-readback
timing. Used to pick the production defaults recorded in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)
CACHE = os.path.join(_ROOT, ".jax_cache")


def bench(make_bank, n_ch, seg, reps=5):
    import jax
    import jax.numpy as jnp

    bank = make_bank()
    state = jax.device_put(bank.init_state())
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((n_ch, seg)).astype(np.float32) * 0.1)
    xi = jax.device_put(rng.standard_normal((n_ch, seg)).astype(np.float32) * 0.1)
    force = jax.jit(lambda o: jnp.sum(o["audio_l"]))
    out, state = bank.process_planar(xr, xi, state)
    cs = float(force(out))
    assert np.isfinite(cs), cs
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out, state = bank.process_planar(xr, xi, state)
        float(force(out))
        dt = min(dt, time.perf_counter() - t0)
    return n_ch * seg * reps / dt / 1e6


def main():
    import jax
    os.makedirs(CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, NRMode, ReceiverConfig)
    from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank, FusedSAMBank

    which = sys.argv[1] if len(sys.argv) > 1 else "notch"
    seg = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17
    n_ch = 128
    if which in ("notch", "lms"):
        cfg = ReceiverConfig(
            mode=DemodMode.CW_NARROW if which == "notch" else DemodMode.USB,
            vfo_freq=14_050_000.0, capture_center_freq=14_049_000.0,
            agc=AGCMode.FAST,
            nr=NRMode.NOTCH if which == "notch" else NRMode.DNR2)
        freqs = [cfg.capture_center_freq + 1e3 * k for k in range(n_ch)]
        for fold_chunk, group in ((1024, 16), (1024, 32)):
            try:
                m = bench(lambda: FusedNRBank(
                    cfg, freqs, fold=True, fold_chunk=fold_chunk,
                    fold_group=group), n_ch, seg)
                print(f"seg={seg} fold chunk={fold_chunk} group={group}: "
                      f"{m:.0f} Ms/s", flush=True)
            except Exception as e:
                print(f"seg={seg} fold chunk={fold_chunk} group={group}: "
                      f"FAIL {str(e)[:100]}", flush=True)
        m = bench(lambda: FusedNRBank(cfg, freqs, fold=False, block_t=8192),
                  n_ch, seg)
        print(f"seg={seg} staged: {m:.0f} Ms/s", flush=True)
    else:
        cfg = ReceiverConfig(
            mode=DemodMode.SAM, vfo_freq=7_060_000.0,
            capture_center_freq=7_050_000.0, agc=AGCMode.MEDIUM)
        freqs = [cfg.capture_center_freq + 1e3 * k for k in range(n_ch)]
        for fold_chunk in (1024, 2048, 4096):
            try:
                m = bench(lambda: FusedSAMBank(
                    cfg, freqs, fold=True, sam_chunk=fold_chunk), n_ch, seg)
                print(f"sam fold chunk={fold_chunk}: {m:.0f} Ms/s", flush=True)
            except Exception as e:
                print(f"sam fold chunk={fold_chunk}: FAIL {str(e)[:100]}",
                      flush=True)
        m = bench(lambda: FusedSAMBank(cfg, freqs, fold=False), n_ch, seg)
        print(f"sam staged: {m:.0f} Ms/s", flush=True)


if __name__ == "__main__":
    main()
