"""Tracing / profiling utilities.

The reference has no active profiling — only vestigial ``elapsedMicros`` stubs
in the backup sketch (SURVEY.md §5). Here profiling is first-class:

- ``trace(logdir)``: context manager around ``jax.profiler`` for device traces
  viewable in TensorBoard/XProf.
- ``time_stage``: wall-clock a jitted callable honestly on backends whose
  ``block_until_ready`` is advisory, by closing a data-dependent chain with a
  scalar readback.
- ``stage_report``: per-stage timing of the receiver pipeline (the north-star
  samples/s/chip metric per stage).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _force(out) -> float:
    """Force completion via scalar readback (sum of the first f32 leaf)."""
    leaves = [l for l in jax.tree.leaves(out)
              if hasattr(l, "dtype") and l.dtype == jnp.float32]
    target = leaves[0] if leaves else jax.tree.leaves(out)[0]
    return float(jax.jit(jnp.sum)(target))


def time_stage(fn, *args, reps: int = 10, warmup: int = 2) -> dict:
    """Honest wall-clock timing of ``fn(*args)``.

    Returns {'seconds_per_call', 'calls_per_s'}. ``fn`` should be jitted and
    its args device-resident; completion is forced by readback.
    """
    out = fn(*args)
    _force(out)
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    dt = (time.perf_counter() - t0) / reps
    return {"seconds_per_call": dt, "calls_per_s": 1.0 / dt}


def stage_report(config=None, n_channels: int = 16, seg_len: int = 1 << 16,
                 reps: int = 5) -> dict:
    """Per-stage samples/s through the receiver pipeline's main stages."""
    from radiodsp_sdr_rx_tpu.models.config import ReceiverConfig
    from radiodsp_sdr_rx_tpu.models.receiver import build_params
    from radiodsp_sdr_rx_tpu.ops import agc as agc_ops
    from radiodsp_sdr_rx_tpu.ops import planar

    config = config or ReceiverConfig()
    p = build_params(config)
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((n_channels, seg_len))
                        .astype(np.float32) * 0.1)
    xi = jax.device_put(rng.standard_normal((n_channels, seg_len))
                        .astype(np.float32) * 0.1)
    zeros = jax.device_put(np.zeros((n_channels, 128), np.float32))
    env0 = jax.device_put(np.full((n_channels,), 1e-6, np.float32))
    incs = jax.device_put(np.full(n_channels, p.nco_inc, np.uint32))
    ph0 = jax.device_put(np.zeros(n_channels, np.uint32))
    w_ssb = jax.device_put(p.w_ssb)
    w_pbt = jax.device_put(p.w_pbt)

    nco_fn = jax.jit(jax.vmap(
        lambda a, b, ph, inc: planar.nco_mix_planar(a, b, ph, inc)[:2]))
    ssb_fn = jax.jit(lambda a, b: planar.ssb_filter_demod_planar(
        a, b, w_ssb, zeros, zeros)[0])
    agc_p = agc_ops.AGCParams(release=p.agc_release, target=p.agc_target,
                              max_gain=p.agc_max_gain, enabled=p.agc_enabled)
    agc_fn = jax.jit(lambda a: agc_ops.agc_run(a, agc_p, env0)[0])
    pbt_fn = jax.jit(lambda a: planar.pbt_filter_planar(a, w_pbt, zeros)[0])

    samples = n_channels * seg_len
    report = {}
    for name, fn, args in [
        ("nco_mix", nco_fn, (xr, xi, ph0, incs)),
        ("ssb_filter_demod", ssb_fn, (xr, xi)),
        ("agc", agc_fn, (xr,)),
        ("pbt_filter", pbt_fn, (xr,)),
    ]:
        t = time_stage(fn, *args, reps=reps)
        report[name] = {
            "msamples_per_s": samples / t["seconds_per_call"] / 1e6,
            "ms_per_call": t["seconds_per_call"] * 1e3,
        }
    return report
