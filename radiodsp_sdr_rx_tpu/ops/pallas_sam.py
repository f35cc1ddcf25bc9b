"""Pallas kernel for the SAM (synchronous AM) carrier-tracking PLL.

The PLL recurrence (ops/planar.demod_sam_planar — phase/freq update from the
atan2 phase detector) is per-sample sequential, like the LMS. The TPU-native
formulation is the same as ops/pallas_lms.py: **channels across the 128 VPU
lanes**, so each sequential step retires 128 channels' worth of work:

    v      = z * conj(exp(j*phase))        # (C,) lanes
    err    = atan2(Im v, Re v)
    freq  += ki * err     (clipped)
    phase += freq + kp * err   (mod 2*pi)
    out[n] = Re v

State (phase, freq) enters and leaves as kernel operands so long streams
chain chunk-to-chunk with ``jax.lax.scan`` outside the kernel — no
cross-grid-step scratch (unsupported on the deployment backend). The loop
gains vs the scan path come from lane parallelism (128 channels/step) plus
the absence of XLA's per-step loop-carry shuffling.

Reference: AudioSDR's SAMmode demod (RDSP_controls.h:372-378 call sites);
loop constants are the spec-level second-order PLL of ops/demod.demod_sam.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_TWO_PI = float(2.0 * np.pi)
_PI = float(np.pi)
_PI_2 = float(np.pi / 2.0)
_PI_4 = float(np.pi / 4.0)


def _atan2_poly(y: jax.Array, x: jax.Array) -> jax.Array:
    """atan2 from primitives this backend lowers (no atan2/atan in Mosaic).

    Octant reduction + the Cephes single-precision arctan polynomial
    (z' = (z-1)/(z+1) reduction to [0, tan pi/8], 4-term minimax): |err|
    ~1e-7 rad — far inside the PLL tolerances (tests compare the whole
    demod chain at 2e-3)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    # ONE divide for both octant branches (round 5): z = lo/hi and the
    # [0, tan pi/8] reduction (z-1)/(z+1) = (lo-hi)/(lo+hi) share it via
    # branch-selected numerator/denominator — divides are the longest-
    # latency links of the PLL's serial chain, and this halves them
    big = lo > np.float32(0.41421356) * hi
    num = jnp.where(big, lo - hi, lo)
    den = jnp.where(big, lo + hi, hi)
    z1 = num / jnp.maximum(den, np.float32(1e-30))
    z2 = z1 * z1
    p = ((((np.float32(8.05374449538e-2) * z2
            - np.float32(1.38776856032e-1)) * z2
           + np.float32(1.99777106478e-1)) * z2
          - np.float32(3.33329491539e-1)) * z2) * z1 + z1
    t = jnp.where(big, np.float32(_PI_4) + p, p)
    t = jnp.where(ay > ax, np.float32(_PI_2) - t, t)
    t = jnp.where(x < 0.0, np.float32(_PI) - t, t)
    return jnp.where(y < 0.0, -t, t)


# Shared-u^2 least-squares sin/cos polynomials on u = phase - pi, u in
# [-pi, pi): measured max |err| ~1.1e-6 for sin, ~5e-7 for cos in f32
# (ADVICE r3) — far inside the 2e-3 chain tolerance; two generic
# transcendental lowerings replaced by 13 FMAs on the PLL's serial
# critical path.
_SIN_C = (9.999997070358e-1, -1.666657721752e-1, 8.33255813248e-3,
          -1.981257592934e-4, 2.704051697171e-6, -2.053426506405e-8)
_COS_C = (9.999999922852e-1, -4.999999177215e-1, 4.166652436402e-2,
          -1.388797041112e-3, 2.477342417935e-5, -2.711337293093e-7,
          1.73691328957e-9)


def _sincos_wrapped(phase):
    """(cos, sin) of ``phase`` in [0, 2*pi).

    Evaluates on the centered u = phase - pi (cos(phase) = -cos(u),
    sin(phase) = -sin(u)) so a single u^2 feeds both Horner chains."""
    u = phase - np.float32(_PI)
    u2 = u * u
    s = np.float32(_SIN_C[-1])
    for k in range(len(_SIN_C) - 2, -1, -1):
        s = s * u2 + np.float32(_SIN_C[k])
    c = np.float32(_COS_C[-1])
    for k in range(len(_COS_C) - 2, -1, -1):
        c = c * u2 + np.float32(_COS_C[k])
    return -c, -(s * u)


def _pll_step(zr, zi, phase, freq, *, kp, ki, max_freq):
    """One exact PLL step. phase stays in [0, 2*pi) by conditional wrap
    (the per-sample increment is bounded by max_freq + kp*pi << 2*pi), which
    replaces mod's divide+floor on the serial chain and is the *more* exact
    of the two. Returns (vr, phase', freq').

    Kept as the self-contained single-step form (chunk heads/tails, tests);
    the loop body uses the split-phase _pll_step_fast below."""
    cr, ci = _sincos_wrapped(phase)
    vr = zr * cr + zi * ci                     # z * conj(ref)
    vi = zi * cr - zr * ci
    err = _atan2_poly(vi, vr)
    freq = jnp.clip(freq + np.float32(ki) * err,
                    -np.float32(max_freq), np.float32(max_freq))
    p = phase + freq + np.float32(kp) * err
    p = jnp.where(p >= np.float32(_TWO_PI), p - np.float32(_TWO_PI), p)
    p = jnp.where(p < 0.0, p + np.float32(_TWO_PI), p)
    return vr, p, freq


def _pll_step_fast(zr, zi, cr, ci, phase, fprev, *, kp, ki, max_freq):
    """One PLL step with the reference oscillator (cr, ci) carried as a
    register and the NEXT step's oscillator built as base + correction
    (round 5 — the serial chain is latency-bound, so this splits the
    per-step phase advance into

        phase_{n+1} = [phase_n + freq_{n-1}]  +  [(freq_n - freq_{n-1})
                       err-independent base        + kp*err_n]  small corr

    where the base's full 13-FMA sincos polynomial hangs only off the
    PREVIOUS step's state — the compiler schedules it in parallel with this
    step's atan2 — and only a 2-term small-angle rotation (|corr| <=
    kp*pi + 2*max_freq ~ 0.065 rad, sin err < 5e-5) stays on the chain.
    The phase/freq STATE recurrences are unchanged and exact (wrap, clip),
    and (cr, ci) re-derives from them through the base polynomial every
    step, so the approximation does not accumulate: each sample's reference
    differs from sincos(phase_n) by a one-step O(1e-5) phase perturbation
    the loop's own feedback absorbs (chain tolerance 2e-3).

    Returns (vr, cr', ci', phase', freq') with freq' = freq_n (= the next
    step's fprev)."""
    vr = zr * cr + zi * ci                     # z * conj(ref)
    vi = zi * cr - zr * ci
    err = vi if _ABLATE_DETECTOR == "stub" else _atan2_poly(vi, vr)
    fnew = jnp.clip(fprev + np.float32(ki) * err,
                    -np.float32(max_freq), np.float32(max_freq))
    corr = (fnew - fprev) + np.float32(kp) * err
    # exact phase state (identical algebra to _pll_step)
    p = phase + fnew + np.float32(kp) * err
    p = jnp.where(p >= np.float32(_TWO_PI), p - np.float32(_TWO_PI), p)
    p = jnp.where(p < 0.0, p + np.float32(_TWO_PI), p)
    # err-independent base for the next oscillator: off the critical chain
    b = phase + fprev
    b = jnp.where(b >= np.float32(_TWO_PI), b - np.float32(_TWO_PI), b)
    b = jnp.where(b < 0.0, b + np.float32(_TWO_PI), b)
    cb, sb = _sincos_wrapped(b)
    # small-angle rotation by corr (the only err-dependent oscillator work)
    g2 = corr * corr
    sing = corr * (np.float32(1.0) - g2 * np.float32(1.0 / 6.0))
    cosg = np.float32(1.0) - g2 * np.float32(0.5)
    cr2 = cb * cosg - sb * sing
    ci2 = sb * cosg + cb * sing
    return vr, cr2, ci2, p, fnew


# Measurement-only ablation hook (tools/bench_sam_r5.py ablate mode):
#   "atan2"    — production (default)
#   "stub"     — phase detector replaced by raw vi (no divide): bounds the
#                atan2's share of the serial chain
#   "skeleton" — the whole PLL loop skipped (audio = band-passed I):
#                bounds everything around the recurrence
# Set by the harness at trace time (each value traces a distinct jaxpr, so
# compile caches stay distinct). NEVER set in production code paths.
_ABLATE_DETECTOR = "atan2"


_PLL_UNROLL = 4


def _pll_loop(chunk, get_zr, get_zi, put_vr, phase, freq,
              *, kp, ki, max_freq, unroll: int = _PLL_UNROLL,
              static: bool = False):
    """Serial PLL over ``chunk`` samples, ``unroll`` samples per fori_loop
    iteration (amortizes loop overhead on the latency-bound chain), static
    tail for chunk % unroll. get/put are index->row accessors so both the
    (chunk, C)-ref kernel and the lanes-chain scratch layout share this.

    The oscillator registers (cr, ci) seed EXACTLY from the carried phase,
    then advance through _pll_step_fast's base + small-rotation split.

    ``static=True`` fully unrolls the loop so every get/put runs at a
    compile-time index — no dynamic-slice lowering on the latency-bound
    chain (same rationale as the LMS macro stream's static unroll). Only
    viable for small chunks (the wide-SAM kernel's 256); the big-chunk
    narrow kernels keep the fori form."""
    if _ABLATE_DETECTOR == "skeleton":
        return phase, freq
    cr, ci = _sincos_wrapped(phase)
    if static:
        for t in range(chunk):
            vr, cr, ci, phase, freq = _pll_step_fast(
                get_zr(t), get_zi(t), cr, ci, phase, freq,
                kp=kp, ki=ki, max_freq=max_freq)
            put_vr(t, vr)
        return phase, freq
    main = chunk - chunk % unroll

    def body(m, carry):
        cr, ci, phase, freq = carry
        n = m * unroll
        for j in range(unroll):
            vr, cr, ci, phase, freq = _pll_step_fast(
                get_zr(n + j), get_zi(n + j), cr, ci, phase, freq,
                kp=kp, ki=ki, max_freq=max_freq)
            put_vr(n + j, vr)
        return (cr, ci, phase, freq)

    cr, ci, phase, freq = jax.lax.fori_loop(0, main // unroll, body,
                                            (cr, ci, phase, freq))
    for t in range(main, chunk):
        vr, cr, ci, phase, freq = _pll_step_fast(
            get_zr(t), get_zi(t), cr, ci, phase, freq,
            kp=kp, ki=ki, max_freq=max_freq)
        put_vr(t, vr)
    return phase, freq


def _sam_kernel(zr_ref, zi_ref, phase_ref, freq_ref,
                out_ref, phase_out_ref, freq_out_ref,
                *, chunk: int, kp: float, ki: float, max_freq: float):
    """One chunk: zr/zi (chunk, C); phase/freq state (1, C)."""

    def put(n, vr):
        out_ref[n, :] = vr

    phase, freq = _pll_loop(
        chunk, lambda n: zr_ref[n, :], lambda n: zi_ref[n, :], put,
        phase_ref[0, :], freq_ref[0, :], kp=kp, ki=ki, max_freq=max_freq)
    phase_out_ref[0, :] = phase
    freq_out_ref[0, :] = freq


def _sam_chunk(zr, zi, phase, freq, *, kp, ki, max_freq, interpret):
    chunk, c = zr.shape
    kernel = functools.partial(_sam_kernel, chunk=chunk, kp=kp, ki=ki,
                               max_freq=max_freq)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((chunk, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(zr, zi, phase, freq)


def sam_pll_run_pallas(
    zr: jax.Array,
    zi: jax.Array,
    phase0: jax.Array,
    freq0: jax.Array,
    bw_hz: float = 100.0,
    sample_rate: float = 44117.64706,
    chunk: int = 4096,
    interpret: bool = False,
):
    """Multi-channel SAM PLL over a stream segment via chunked Pallas calls.

    zr, zi: (C, n) f32 band-passed IQ with C == 128 (pad otherwise);
    phase0, freq0: (C,) f32 PLL carries. Returns (vr (C, n), phase', freq')
    — vr is the in-phase product (pre-DC-blocker audio); run
    ops/iir.dc_blocker on it afterwards for demod_sam_planar parity.
    """
    c, n = zr.shape
    if c != LANES:
        raise ValueError(f"channel axis must be {LANES} (pad)")
    chunk = min(chunk, n)
    if n % chunk:
        raise ValueError("n must be a multiple of chunk")
    wn = 2.0 * np.pi * bw_hz / sample_rate
    zeta = 0.70710678
    kp = float(2.0 * zeta * wn)
    ki = float(wn * wn)
    max_freq = float(2.0 * np.pi * 2000.0 / sample_rate)

    # (C, n) -> chunks of (chunk, C): lanes = channels
    zrs = jnp.swapaxes(jnp.moveaxis(zr.reshape(c, n // chunk, chunk), 1, 0),
                       1, 2)
    zis = jnp.swapaxes(jnp.moveaxis(zi.reshape(c, n // chunk, chunk), 1, 0),
                       1, 2)

    def step(carry, inputs):
        phase, freq = carry
        zrc, zic = inputs
        vr, p2, f2 = _sam_chunk(zrc, zic, phase, freq, kp=kp, ki=ki,
                                max_freq=max_freq, interpret=interpret)
        return (p2, f2), vr

    p0 = jnp.asarray(phase0, jnp.float32)[None, :]
    f0 = jnp.asarray(freq0, jnp.float32)[None, :]
    (pf, ff), vrs = jax.lax.scan(step, (p0, f0), (zrs, zis))
    vr = jnp.moveaxis(jnp.swapaxes(vrs, 1, 2), 0, 1).reshape(c, n)
    return vr, pf[0], ff[0]
