"""Pallas kernel for the normalized-LMS noise reducer / auto-notch.

The LMS recurrence (ops/lms.py — CMSIS arm_lms_norm_f32 semantics with the
reference's 128-sample decorrelation delay) is inherently per-sample
sequential. The TPU-native formulation puts **channels across the 128 VPU
lanes** and the 96 taps across sublanes, so each sequential step still moves a
(96, 128) tile of useful work:

    win   <- shift_in(win, x[n])          # (taps, C)
    y[n]   = sum_taps(w * win)            # lane-wise reduction -> (C,)
    e[n]   = d[n] - y[n]
    w     += (mu * e[n] / (||win||^2 + eps)) * win

State (weights, window, delay carry) enters and leaves as kernel operands, so
long streams chain chunk-to-chunk with ``jax.lax.scan`` *outside* the kernel —
no cross-grid-step scratch (unsupported on the deployment backend).

The channel axis is padded to 128; the time chunk is a static kernel constant.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiodsp_sdr_rx_tpu.ops.lms import LMS_DELAY, _EPS

LANES = 128


def _lms_kernel(x_ref, d_ref, mu_ref, w_ref, win_ref, y_ref, e_ref,
                w_out_ref, win_out_ref, *, chunk: int, taps: int,
                unroll: int = 8, paired: bool = True):
    """One chunk: x_ref/d_ref (chunk, C); states (taps, C).

    The per-sample recurrence is unavoidable (weights adapt every sample),
    so the kernel minimizes VPU instructions per step instead:

      - ``unroll`` samples share one (taps+U, C) register tile; each step's
        window is a STATIC slice of it (the naive form shifts the whole
        (taps, C) window — 12 register copies — every sample);
      - window energy updates incrementally within the tile
        (energy += x_new^2 - x_old^2, CMSIS arm_lms_norm_f32's own scheme;
        re-based at every macro step so rounding drift is bounded at U
        updates, measured ~1e-7 relative);
      - the remaining per-sample work is the 96-tap dot + FMA update, which
        is the true VPU floor (2 passes over the (taps, C) tile).

    Measured 2x over the naive per-sample form (docs/PERFORMANCE.md).
    """
    mu = mu_ref[0, 0]

    def substep(u, tile, w, energy, m):
        win = tile[u + 1:u + 1 + taps, :]          # static slice
        xn2 = tile[taps + u, :] * tile[taps + u, :]
        xo2 = tile[u, :] * tile[u, :]
        energy = energy + (xn2 - xo2)
        y = jnp.sum(w * win, axis=0)               # (C,)
        n = m * unroll + u
        e = d_ref[n, :] - y
        coeff = mu * e / (energy + _EPS)
        w = w + coeff[None, :] * win
        y_ref[n, :] = y
        e_ref[n, :] = e
        return w, energy

    def pairstep(u, tile, w, energy, m):
        """Two samples with one weight read (exact algebra): both dots use
        the pair-start weights; sample u+1's output is corrected with the
        lag-1 window correlation,

            y1 = w*win1 + c0 * (win0 . win1)   ==  (w + c0 win0) . win1

        so the serial chain per pair is just e0 -> c0 -> e1 -> c1 -> update
        while all three 96-tap reductions issue in parallel."""
        win0 = tile[u + 1:u + 1 + taps, :]
        win1 = tile[u + 2:u + 2 + taps, :]
        e0n = tile[taps + u, :] * tile[taps + u, :]
        e0o = tile[u, :] * tile[u, :]
        e1n = tile[taps + u + 1, :] * tile[taps + u + 1, :]
        e1o = tile[u + 1, :] * tile[u + 1, :]
        energy0 = energy + (e0n - e0o)
        energy1 = energy0 + (e1n - e1o)
        y0 = jnp.sum(w * win0, axis=0)
        y1p = jnp.sum(w * win1, axis=0)
        r01 = jnp.sum(win0 * win1, axis=0)         # data-independent
        n = m * unroll + u
        e0 = d_ref[n, :] - y0
        c0 = mu * e0 / (energy0 + _EPS)
        y1 = y1p + c0 * r01
        e1 = d_ref[n + 1, :] - y1
        c1 = mu * e1 / (energy1 + _EPS)
        w = w + (c0[None, :] * win0 + c1[None, :] * win1)
        y_ref[n, :] = y0
        e_ref[n, :] = e0
        y_ref[n + 1, :] = y1
        e_ref[n + 1, :] = e1
        return w, energy1

    def macro(m, carry):
        w, win = carry
        xs = x_ref[pl.ds(m * unroll, unroll), :]   # (U, C) new samples
        tile = jnp.concatenate([win, xs], axis=0)  # (taps+U, C)
        # fresh energy base per macro step (bounds incremental rounding)
        base = tile[1:1 + taps, :]
        energy = jnp.sum(base * base, axis=0) - (
            tile[taps, :] * tile[taps, :] - tile[0, :] * tile[0, :])
        if paired:
            for u in range(0, unroll, 2):          # static unroll, pairs
                w, energy = pairstep(u, tile, w, energy, m)
        else:
            for u in range(unroll):                # static unroll
                w, energy = substep(u, tile, w, energy, m)
        return (w, tile[unroll:, :])

    w, win = jax.lax.fori_loop(0, chunk // unroll, macro,
                               (w_ref[:], win_ref[:]))
    w_out_ref[:] = w
    win_out_ref[:] = win


def _grouped_macro(tile, ds, w, mu, *, taps: int, group: int):
    """One grouped macro step (exact algebra, v3).

    tile: (taps+U, C) = [carried window | U new samples]; ds: (U, C) desired;
    w: (taps, C). Returns (y (U, C), e (U, C), w').

    Key structural wins over the paired form (_lms_kernel pairstep):

      - the normalizer energies depend only on the INPUT (not on the error
        recursion), so all U divides hoist out of the serial chain into ONE
        vectorized reciprocal: invs = mu / (energies + eps);
      - predictions y0_k = w_start . win_k for the whole group come from one
        sliding-conv pass (taps static-slice FMAs over (U, C) tiles) — no
        per-sample reduction trees on the critical path;
      - the group's lag correlations r_{j,k} = win_j . win_k come from a
        second sliding pass (r0[d] = win_0 . win_d, d=0 giving the energy
        base) plus exact telescoped updates
        r_{j,j+d} = r_{j-1,j-1+d} + a[taps+j]a[taps+j+d] - a[j]a[j+d];
      - the exact-update identity y_k = w_start . win_k
        + sum_{j<k} c_j (win_j . win_k) (same as the paired kernel, extended
        to the group) leaves a serial chain of pure (1, C) row FMAs.

    Rounding drift is bounded per macro step: energies and r0 are recomputed
    fresh from the tile every group (no cross-group incremental state beyond
    the weights/window themselves).
    """
    U = group
    c = tile.shape[1]

    # sliding passes: predictions and lag-0..U-1 correlations of win_0.
    # FOUR independent accumulators per quantity: a single accumulator makes
    # the taps-long FMA loop one serial dependency chain, capping the VPU at
    # ~1 vector op per FMA latency; interleaved partials expose ILP.
    acc_r = [jnp.zeros((U, c), jnp.float32) for _ in range(4)]
    acc_p = [jnp.zeros((U, c), jnp.float32) for _ in range(4)]
    for i in range(taps):
        sl = tile[1 + i:1 + i + U, :]                 # (U, C) static slice
        acc_r[i % 4] = acc_r[i % 4] + tile[1 + i:2 + i, :] * sl
        acc_p[i % 4] = acc_p[i % 4] + w[i:i + 1, :] * sl
    r0 = (acc_r[0] + acc_r[1]) + (acc_r[2] + acc_r[3])
    preds = (acc_p[0] + acc_p[1]) + (acc_p[2] + acc_p[3])

    # energies: energy_k = ||win_k||^2 = r0[0] + cumsum(sq[taps+i] - sq[i])
    sq = tile * tile
    if U > 1:
        deltas = sq[taps + 1:taps + U, :] - sq[1:U, :]   # (U-1, C)
        sh = 1
        while sh < U - 1:
            deltas = deltas + jnp.concatenate(
                [jnp.zeros((sh, c), deltas.dtype), deltas[:-sh]], axis=0)
            sh *= 2
        energies = jnp.concatenate(
            [jnp.zeros((1, c), jnp.float32), deltas], axis=0) + r0[0:1, :]
    else:
        energies = r0[0:1, :]
    invs = mu / (energies + _EPS)                     # ONE vectorized divide

    # r_{j, j+d} rows for every pair in the group (exact telescoped slide)
    r = {}
    for d in range(1, U):
        cnt = U - d
        base = r0[d:d + 1, :]
        if cnt > 1:
            q = (tile[taps + 1:taps + cnt, :]
                 * tile[taps + 1 + d:taps + cnt + d, :]
                 - tile[1:cnt, :] * tile[1 + d:cnt + d, :])   # (cnt-1, C)
            sh = 1
            while sh < cnt - 1:
                q = q + jnp.concatenate(
                    [jnp.zeros((sh, c), q.dtype), q[:-sh]], axis=0)
                sh *= 2
            rows = jnp.concatenate([base, base + q], axis=0)  # (cnt, C)
        else:
            rows = base
        for j in range(cnt):
            r[(j, j + d)] = rows[j:j + 1, :]

    # serial chain: pure row FMAs (divides already hoisted)
    y_rows = [preds[k:k + 1, :] for k in range(U)]
    e_rows = []
    c_rows = []
    for k in range(U):
        e_k = ds[k:k + 1, :] - y_rows[k]
        c_k = e_k * invs[k:k + 1, :]
        e_rows.append(e_k)
        c_rows.append(c_k)
        for l in range(k + 1, U):
            y_rows[l] = y_rows[l] + c_k * r[(k, l)]

    # one weight update per group: w' = w + sum_k c_k win_k (4 independent
    # partial deltas — same ILP rationale as the sliding passes above)
    acc_w = [None, None, None, None]
    for k in range(U):
        term = c_rows[k] * tile[k + 1:k + 1 + taps, :]
        acc_w[k % 4] = term if acc_w[k % 4] is None else acc_w[k % 4] + term
    for a in acc_w:
        if a is not None:
            w = w + a

    return (jnp.concatenate(y_rows, axis=0),
            jnp.concatenate(e_rows, axis=0), w)


def _grouped_macro_r(tile, ds, w, mu, *, taps: int, group: int, r_in=None,
                     emit_r: bool = True):
    """Grouped exact-NLMS macro step, v4: telescoped lag-correlation register.

    Same algebra as _grouped_macro (v3), but the group-pair correlations
    r_{k, k+d} = win_k . win_d come from ONE carried register
    R_k[d] (d = 0..group-1) that slides with the sample position,

        R_{k+1}[d] = R_k[d] + a[k+1+taps] a[k+1+taps+d] - a[k+1] a[k+1+d]

    (a = tile rows; win_k = tile[k+1 : k+1+taps]), instead of v3's fresh
    per-group sliding pass (taps FMAs over a (U, C) tile) plus per-diagonal
    telescopes. The slide costs ~4 (U, C) FMAs per sample vs v3's
    taps/group + diagonal construction — the measured win is ~15-20% on the
    whole folded notch/denoise chain (docs/PERFORMANCE.md round 5).

    Needs ``group`` lookahead rows beyond the group's own samples: tile is
    (taps + 2*group, C) = [carried window | group new samples | the NEXT
    group's samples]; the slid-out register R_group (= the next group's
    R_0) is returned for chaining. ``r_in=None`` recomputes R fresh from
    the tile in the same ILP-4 sliding pass as the predictions — callers
    rebase once per 128-row block so incremental rounding drift stays
    bounded at 128 samples (measured ~1e-6 absolute on the chip vs v3).

    Returns (y (U, C), e (U, C), w', r_out (U, C)).
    """
    U = group
    c = tile.shape[1]
    if tile.shape[0] != taps + 2 * U:
        raise ValueError(f"tile rows {tile.shape[0]} != taps+2*group "
                         f"{taps + 2 * U}")

    acc_p = [jnp.zeros((U, c), jnp.float32) for _ in range(4)]
    acc_r = ([jnp.zeros((U, c), jnp.float32) for _ in range(4)]
             if r_in is None else None)
    for i in range(taps):
        sl = tile[1 + i:1 + i + U, :]                 # (U, C) static slice
        acc_p[i % 4] = acc_p[i % 4] + w[i:i + 1, :] * sl
        if acc_r is not None:
            acc_r[i % 4] = acc_r[i % 4] + tile[1 + i:2 + i, :] * sl
    preds = (acc_p[0] + acc_p[1]) + (acc_p[2] + acc_p[3])
    R = (r_in if r_in is not None
         else (acc_r[0] + acc_r[1]) + (acc_r[2] + acc_r[3]))

    # energies: energy_k = ||win_k||^2 = R[0] + cumsum(sq[taps+i] - sq[i])
    sq = tile * tile
    if U > 1:
        deltas = sq[taps + 1:taps + U, :] - sq[1:U, :]   # (U-1, C)
        sh = 1
        while sh < U - 1:
            deltas = deltas + jnp.concatenate(
                [jnp.zeros((sh, c), deltas.dtype), deltas[:-sh]], axis=0)
            sh *= 2
        energies = jnp.concatenate(
            [jnp.zeros((1, c), jnp.float32), deltas], axis=0) + R[0:1, :]
    else:
        energies = R[0:1, :]
    invs = mu / (energies + _EPS)                     # ONE vectorized divide

    # serial chain: row FMAs with corrections read straight off the sliding
    # register (R at step k IS [r_{k,k}, r_{k,k+1}, ...]); the R slide is
    # data-independent of the e/c recursion so it issues alongside the tail
    y_rows = [preds[k:k + 1, :] for k in range(U)]
    e_rows = []
    c_rows = []
    for k in range(U):
        e_k = ds[k:k + 1, :] - y_rows[k]
        c_k = e_k * invs[k:k + 1, :]
        e_rows.append(e_k)
        c_rows.append(c_k)
        for l in range(k + 1, U):
            y_rows[l] = y_rows[l] + c_k * R[l - k:l - k + 1, :]
        if k + 1 < U or emit_r:   # last slide is pure r_out (skippable when
            R = (R + tile[k + 1 + taps:k + 2 + taps, :]   # the next macro
                 * tile[k + 1 + taps:k + 1 + taps + U, :]  # rebases)
                 - tile[k + 1:k + 2, :] * tile[k + 1:k + 1 + U, :])

    # one weight update per group (identical to v3)
    acc_w = [None, None, None, None]
    for k in range(U):
        term = c_rows[k] * tile[k + 1:k + 1 + taps, :]
        acc_w[k % 4] = term if acc_w[k % 4] is None else acc_w[k % 4] + term
    for a in acc_w:
        if a is not None:
            w = w + a

    return (jnp.concatenate(y_rows, axis=0),
            jnp.concatenate(e_rows, axis=0), w, R)


def _lms_grouped_kernel(x_ref, d_ref, mu_ref, w_ref, win_ref, y_ref, e_ref,
                        w_out_ref, win_out_ref, *, chunk: int, taps: int,
                        group: int):
    """Grouped (v3) LMS kernel body: see _grouped_macro."""
    mu = mu_ref[0, 0]

    def macro(m, carry):
        w, win = carry
        xs = x_ref[pl.ds(m * group, group), :]
        ds = d_ref[pl.ds(m * group, group), :]
        tile = jnp.concatenate([win, xs], axis=0)
        y, e, w = _grouped_macro(tile, ds, w, mu, taps=taps, group=group)
        y_ref[pl.ds(m * group, group), :] = y
        e_ref[pl.ds(m * group, group), :] = e
        return (w, tile[group:, :])

    w, win = jax.lax.fori_loop(0, chunk // group, macro,
                               (w_ref[:], win_ref[:]))
    w_out_ref[:] = w
    win_out_ref[:] = win


def lms_chunk(x, d, mu, w, win, *, unroll: int = 16,
              paired: bool = True, group: int = 0, interpret: bool = False):
    """Run one LMS chunk. x, d: (chunk, C) f32; w, win: (taps, C) f32.

    Returns (y (chunk, C), e (chunk, C), w', win').
    """
    chunk, c = x.shape
    taps = w.shape[0]
    if c != LANES:
        raise ValueError(f"channel axis must be {LANES} (pad)")
    if group:
        if chunk % group:
            raise ValueError(f"chunk {chunk} must be a multiple of "
                             f"group {group}")
        kernel = functools.partial(_lms_grouped_kernel, chunk=chunk,
                                   taps=taps, group=group)
    else:
        if chunk % unroll:
            raise ValueError(f"chunk {chunk} must be a multiple of "
                             f"unroll {unroll}")
        kernel = functools.partial(_lms_kernel, chunk=chunk, taps=taps,
                                   unroll=unroll, paired=paired)
    mu_arr = jnp.full((1, 1), mu, jnp.float32)
    y, e, w2, win2 = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((chunk, c), jnp.float32),
            jax.ShapeDtypeStruct((chunk, c), jnp.float32),
            jax.ShapeDtypeStruct((taps, c), jnp.float32),
            jax.ShapeDtypeStruct((taps, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, d, mu_arr, w, win)
    return y, e, w2, win2


def lms_nr_run_pallas(
    x: jax.Array,
    weights: jax.Array,
    window: jax.Array,
    delay: jax.Array,
    first: jax.Array,
    mu,
    mode: str = "denoise",
    chunk: int = 4096,
    unroll: int = 16,
    paired: bool = True,
    group: int = 0,
    interpret: bool = False,
):
    """Multi-channel LMS over a stream segment via chunked Pallas calls.

    x: (C, n) f32 with C == 128 (pad otherwise); weights/window: (C, taps);
    delay: (C, LMS_DELAY) carry; first: bool (reference first-block quirk).
    group > 0 selects the grouped v3 kernel (_grouped_macro) with that group
    size (8/16 typical); 0 keeps the paired v2 kernel.
    Returns (out (C, n), weights', window', delay').

    Semantics match vmapped ops/lms.lms_nr_run over channels.
    """
    c, n = x.shape
    chunk = min(chunk, n)
    gran = group if group else unroll   # sample granularity of the kernel
    # shrink to a divisor of n (halving like pallas_sweep._even_chunks) so
    # e.g. n=6144 with the 4096 default still runs (chunk 2048) instead of
    # raising; only truly indivisible lengths are an error
    while n % chunk and chunk > gran:
        chunk //= 2
    if n % chunk or chunk % gran:
        raise ValueError(
            f"n={n} has no chunk divisor that is a multiple of {gran}")

    # desired = 128-delayed stream; first block predicts itself
    shifted = jnp.concatenate([delay, x], axis=-1)[:, :n]
    idx = jnp.arange(n)
    d = jnp.where(jnp.logical_and(first, idx < LMS_DELAY)[None, :], x, shifted)

    # (C, n) -> chunks of (chunk, C): lanes = channels
    xs = jnp.moveaxis(x.reshape(c, n // chunk, chunk), 1, 0)   # (nc, C, chunk)
    ds = jnp.moveaxis(d.reshape(c, n // chunk, chunk), 1, 0)
    xs = jnp.swapaxes(xs, 1, 2)                                # (nc, chunk, C)
    ds = jnp.swapaxes(ds, 1, 2)

    w0 = jnp.swapaxes(weights, 0, 1)                           # (taps, C)
    win0 = jnp.swapaxes(window, 0, 1)

    def step(carry, inputs):
        w, win = carry
        xc, dc = inputs
        y, e, w2, win2 = lms_chunk(xc, dc, mu, w, win, unroll=unroll,
                                   paired=paired, group=group,
                                   interpret=interpret)
        return (w2, win2), (y, e)

    (wf, winf), (ys, es) = jax.lax.scan(step, (w0, win0), (xs, ds))
    out = ys if mode == "denoise" else es                      # (nc, chunk, C)
    out = jnp.moveaxis(jnp.swapaxes(out, 1, 2), 0, 1).reshape(c, n)
    new_delay = jnp.concatenate([delay, x], axis=-1)[:, -LMS_DELAY:]
    return out, jnp.swapaxes(wf, 0, 1), jnp.swapaxes(winf, 0, 1), new_delay
