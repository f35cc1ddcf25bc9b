"""Real-chip benchmark: single-sweep DMA kernel vs stateless fused kernel.

Honest timing per docs/PERFORMANCE.md: device-resident inputs, data-dependent
chain of invocations (each rep consumes the previous rep's output), closed by
a scalar readback. Run under the subprocess watchdog pattern:

    timeout 420 python tools/bench_sweep.py
"""

import sys
import time

import numpy as np


N_CHANNELS = 128
SEG_LEN = 1 << 19
WARMUP = 2
REPS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from radiodsp_sdr_rx_tpu.ops import fir_design
    from radiodsp_sdr_rx_tpu.ops.pallas_kernels import (
        fused_mix_filter_demod, ssb_demod_operator)
    from radiodsp_sdr_rx_tpu.ops.pallas_sweep import sweep_mix_filter_demod

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((N_CHANNELS, SEG_LEN))
                        .astype(np.float32) * 0.1)
    xi = jax.device_put(rng.standard_normal((N_CHANNELS, SEG_LEN))
                        .astype(np.float32) * 0.1)
    mask = fir_design.design_filter_mask(300.0, 4000.0, 44117.64706)
    w = jax.device_put(ssb_demod_operator(mask))
    inc = jax.device_put(np.full((N_CHANNELS,), 123456789, np.uint32))
    ph0 = jax.device_put(np.zeros((N_CHANNELS,), np.uint32))

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn(xr, xi)
        cs = float(jnp.sum(out))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s "
              f"checksum {cs:.4f}", file=sys.stderr)
        if not np.isfinite(cs):
            raise RuntimeError(f"{name}: non-finite output")
        a, b = xr, xi
        for _ in range(WARMUP):
            o = fn(a, b)
            a, b = o, a
        float(jnp.sum(o))
        a, b = xr, xi
        t0 = time.perf_counter()
        for _ in range(REPS):
            o = fn(a, b)
            a, b = o, a          # data-dependent chain
        float(jnp.sum(o))
        dt = time.perf_counter() - t0
        msps = N_CHANNELS * SEG_LEN * REPS / dt / 1e6
        print(f"{name}: {msps:.0f} Msamples/s", file=sys.stderr)
        return msps

    if "--full" not in sys.argv:
        stateless = jax.jit(
            lambda a, b: fused_mix_filter_demod(a, b, inc, ph0, w))
        timed("stateless (16B/sample)", stateless)

        for chunk_t in (2048, 4096, 8192):
            sweep = jax.jit(lambda a, b, ct=chunk_t: sweep_mix_filter_demod(
                a, b, inc, ph0, w, chunk_t=ct))
            try:
                timed(f"sweep chunk_t={chunk_t} (8B/sample)", sweep)
            except Exception as e:  # noqa: BLE001
                print(f"sweep chunk_t={chunk_t}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", file=sys.stderr)
        return

    from radiodsp_sdr_rx_tpu.ops.pallas_kernels import pbt_operator
    from radiodsp_sdr_rx_tpu.ops.pallas_sweep import sweep_full_chain
    from radiodsp_sdr_rx_tpu.ops import agc as agc_ops

    w_pbt = jax.device_put(pbt_operator(mask))
    z128 = jax.device_put(np.zeros((N_CHANNELS, 128), np.float32))
    env0 = jax.device_put(np.full((N_CHANNELS,), 1e-6, np.float32))
    p = agc_ops.AGC_PRESETS["medium"]

    for chunk_t in (4096, 8192):
        for emit_r in (True, False):
            fc = jax.jit(lambda a, b, ct=chunk_t, er=emit_r: sweep_full_chain(
                a, b, inc, ph0, w, w_pbt, z128, z128, z128, env0,
                p.release, p.target, p.max_gain, out_gain=1.1,
                chunk_t=ct, emit_r=er)[0])
            try:
                timed(f"full-chain chunk_t={chunk_t} emit_r={emit_r}", fc)
            except Exception as e:  # noqa: BLE001
                print(f"full-chain chunk_t={chunk_t} emit_r={emit_r}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr)


if __name__ == "__main__":
    main()
