"""Single-sweep chains with a channels-on-lanes adaptive stage folded in.

The LMS noise reducer / auto-notch (ops/pallas_lms.py) and the SAM PLL
(ops/pallas_sam.py) are per-sample recurrences that want **channels across
the 128 VPU lanes**, while the streaming sweep skeleton (ops/pallas_sweep.py)
wants **time across lanes**. Round 2 staged them as separate kernels with XLA
transposes in between — 3-5 full HBM round-trips per sample on a
bandwidth-bound chain (configs 3/4 at 0.8-0.9 Gs/s, docs/PERFORMANCE.md).

This module folds them into ONE kernel by doing the layout change **inside
VMEM on the MXU**: a (128, 128) tile transpose is a single matmul against the
identity,

    X^T = dot_general(X, I, contract dim0-with-dim0)   # out[m,i] = X[i,m]

(~128 MACs/sample — noise next to the 512 MACs/sample filter matmul), so the
whole chain runs per chunk as

  2-slot DMA ring -> NCO mix -> overlap-save filter/demod (MXU) ->
  [per-128-block MXU transpose -> adaptive stage on (time, C) scratch ->
   MXU transpose back] -> AGC -> PBT -> output DMA

with every carry (framing tails, AGC env, LMS weights/window/delay block,
PLL phase/freq, DC blocker) living in VMEM across chunks. The channel axis is
the full lane width: C == 128 (pad smaller banks), grid = (1,).

Variants (static ``demod`` x ``nr``, round 4 — the reference applies NR to
every mode's audio, RadioDSP_SDR_RX.ino:198):
  - demod "ssb" | "am" (envelope + DC blocker) | "sam" (PLL on lanes + DC
    blocker — AudioSDR SAMmode, RDSP_controls.h:372-378);
  - nr "none" | "denoise" (post-PBT LMS predictor y, x1.1 makeup, mono —
    RDSP_convolutional.h:326-337) | "notch" (ALS auto-notch BETWEEN demod
    and AGC, RDSP_controls.h:257-262) | "spectral" (backup-engine spectral
    subtraction post-PBT, src/backup/RDSP_convolutional_spec.h:112-252).
  The legacy ``stage`` shorthand maps: denoise/notch -> ssb+lms, sam ->
  sam+none, none -> ssb+none.

Parity: matches the staged FusedNRBank/FusedSAMBank paths (and therefore
ReceiverBank) to f32 tolerance — tests/test_fused_bank.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiodsp_sdr_rx_tpu.ops.lms import LMS_DELAY, _EPS
from radiodsp_sdr_rx_tpu.ops.mxu import mxu_dot
from radiodsp_sdr_rx_tpu.ops.pallas_lms import _grouped_macro, _grouped_macro_r
from radiodsp_sdr_rx_tpu.ops.pallas_sam import (
    _pll_loop, _pll_step_fast, _sincos_wrapped,
)
from radiodsp_sdr_rx_tpu.ops.pallas_sweep import (
    _PHASE_SCALE, _env_lanes, _env_rows, _even_chunks, _iir_lanes, _iir_rows,
)

LANES = 128
_TWO_PI = float(2.0 * np.pi)


def _transpose_mxu(x: jax.Array, ident: jax.Array,
                   passes: int = 3) -> jax.Array:
    """(128, 128) tile transpose as MXU matmuls: out[m, i] = x[i, m], EXACT
    at passes=3; ~1e-5 relative (16-bit mantissa) at passes=2.

    A transpose is data movement — at the default 1-pass bf16 it would ROUND
    every value to 8 mantissa bits (4e-3 relative) on each layout change,
    which the SAM PLL's phase recurrence then amplifies to O(1) output error
    (chip-bisected root cause, round 3). Round 3 used Precision.HIGHEST
    (6 bf16 passes); but because the OTHER operand is the identity — exact in
    bf16, with zero low part — splitting only the data side into three
    non-overlapping bf16 terms x = x1 + x2 + x3 (8+8+8 >= 24 mantissa bits)
    and summing the three 1-pass products reconstructs the f32 value
    EXACTLY in half the MXU passes: every product is bf16*1.0 or bf16*0.0
    (exact in the f32 accumulator) and the final f32 sums of non-overlapping
    parts are exact."""
    dims = (((0,), (0,)), ((), ()))
    ident16 = ident.astype(jnp.bfloat16)   # exact: entries are 0.0 / 1.0

    def dd(a):
        return jax.lax.dot_general(a, ident16, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    x1 = x.astype(jnp.bfloat16)
    r1 = x - x1.astype(jnp.float32)
    x2 = r1.astype(jnp.bfloat16)
    if passes == 2:
        return dd(x1) + dd(x2)
    x3 = (r1 - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return (dd(x1) + dd(x2)) + dd(x3)


def _lanes_chain_kernel(
    inc_ref, phase0_ref, tin_r_ref, tin_i_ref, atail_in_ref, env0_ref,
    w_lms_in, win_lms_in, delay_in, flags_ref, dcx0_ref, dcy0_ref, pll0_ref,
    nfl0_ref, stl_in_ref, str_in_ref, nbavg0_ref, nbmask0_ref,
    xr_hbm, xi_hbm, w_ref, wpbt_ref, wsf_ref, wsi_ref, ident_ref,
    l_hbm, r_hbm, atail_out_ref, env_out_ref,
    w_lms_out, win_lms_out, delay_out, dcx_out_ref, dcy_out_ref, pll_out_ref,
    nfl_out_ref, stl_out_ref, str_out_ref, nbavg_out_ref, nbmask_out_ref,
    buf_r, buf_i, buf_l, buf_ro, sem_r, sem_i, sem_l, sem_ro,
    tail_r, tail_i, audio_tail, env_carry,
    t_buf, d_buf, lms_w, lms_win, lms_prev, dcx, dcy, pll_st, t_buf2,
    nfl_carry, st_l, st_r, nbavg, nbmask, t_zr1, t_zi1,
    *, chunk_nb: int, n_chunks: int, out_gain: float,
    agc_release: float, agc_target: float, agc_max_gain: float,
    agc_enabled: bool, demod: str, nr: str, mu: float, group: int, taps: int,
    nr_gain: float,
    dc_pole: float, pll_kp: float, pll_ki: float, pll_max_freq: float,
    in_gain: float = 1.0, iq_balance: float = 1.0,
    nb: bool = False, nb_thresh: float = 3.1623, nb_a: float = 0.998047,
    precision=None, unroll_lms: bool = True,
):
    """One kernel instance = the whole 128-channel bank, streaming time.

    ``demod`` in ("ssb", "am", "sam") x ``nr`` in ("none", "denoise",
    "notch", "spectral") — every reference-legal mode x NR combination on
    the lanes skeleton, in the ReceiverBank stage order (demod -> notch ->
    AGC -> PBT -> denoise/spectral, models/receiver.py:219-280).

    Refs by config (unused ones are 1-element dummies):
      lms ("denoise"/"notch"): w_lms (taps, 128), delay (128, 128) [the
        previous 128 time-major input samples], flags (1,1) f32 first-block
        quirk (win_lms is derived from delay — window invariant).
      demod "am"/"sam": dcx0/dcy0 (C, 1) per-channel DC-blocker carries
        [last envelope input | last output]; "sam" additionally pll0
        (2, 128) [phase | freq] with channels on LANES.
      nr "spectral": nfl0 (C, 1) noise-floor carry, stl/str (C, 128)
        previous post-PBT block (frame carries), wsf (512, 512) forward and
        wsi (512, 256) inverse spectral operators.
    """
    cb = LANES
    chunk = chunk_nb * 128
    lms = nr in ("denoise", "notch")
    c0 = pl.program_id(0) * cb   # grid over 128-channel lane groups
    # software-pipelined SAM driver (round 5): needs an even chunk count
    # (static 2-slot t_buf scheduling) — the wrapper sizes the scratch
    # buffers with the SAME predicate
    sam_pipe = (demod == "sam" and nr == "none"
                and n_chunks % 2 == 0 and n_chunks >= 2)

    def dma_in(slot, t):
        return (
            pltpu.make_async_copy(
                xr_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
                buf_r.at[slot], sem_r.at[slot]),
            pltpu.make_async_copy(
                xi_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
                buf_i.at[slot], sem_i.at[slot]),
        )

    def dma_out(t):
        """Store DMAs for chunk ``t`` (single staging slot, deferred wait)."""
        outs = [pltpu.make_async_copy(
            buf_l.at[0],
            l_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
            sem_l.at[0])]
        if nr != "denoise":
            outs.append(pltpu.make_async_copy(
                buf_ro.at[0],
                r_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
                sem_ro.at[0]))
        return outs

    inc = inc_ref[:][:, :, None]
    ph0 = phase0_ref[:][:, :, None]

    g_i = np.float32(in_gain)
    g_q = np.float32(in_gain * iq_balance)
    scaled = not (in_gain == 1.0 and iq_balance == 1.0)

    # mix the raw input tails (positions -128..-1) into the carried mixed tail
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cb, 1, 128), 2)
    ang_t = ((ph0 + (lane_t - 128) * inc).astype(jnp.float32) * _PHASE_SCALE)
    ct, st_ = jnp.cos(ang_t), jnp.sin(ang_t)
    tr_in = tin_r_ref[:][:, None, :]
    ti_in = tin_i_ref[:][:, None, :]
    if scaled:
        tr_in = tr_in * g_i
        ti_in = ti_in * g_q
    if nb:
        # previous segment's last-block keep mask: blanking is a 0/1 gate
        # that commutes with the scale + mix (ops/pallas_sweep NB fold)
        tail_r[:] = (tr_in * ct + ti_in * st_)[:, 0, :] * nbmask0_ref[:]
        tail_i[:] = (ti_in * ct - tr_in * st_)[:, 0, :] * nbmask0_ref[:]
        nbavg[:] = jnp.broadcast_to(nbavg0_ref[:], (cb, 128))
    else:
        tail_r[:] = (tr_in * ct + ti_in * st_)[:, 0, :]
        tail_i[:] = (ti_in * ct - tr_in * st_)[:, 0, :]
    audio_tail[:] = atail_in_ref[:]
    env_carry[:] = jnp.broadcast_to(env0_ref[:], (cb, 128))
    if lms:
        lms_w[:] = w_lms_in[:]
        lms_win[:] = win_lms_in[:]
        lms_prev[:] = delay_in[:]
    if demod in ("am", "sam"):
        dcx[:] = jnp.broadcast_to(dcx0_ref[:], (cb, 128))
        dcy[:] = jnp.broadcast_to(dcy0_ref[:], (cb, 128))
    if demod == "sam":
        pll_st[:] = pll0_ref[:]
    if nr == "spectral":
        nfl_carry[:] = jnp.broadcast_to(nfl0_ref[:], (cb, 128))
        st_l[:] = stl_in_ref[:]
        st_r[:] = str_in_ref[:]

    d0r, d0i = dma_in(0, 0)
    d0r.start()
    d0i.start()

    blk = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk_nb, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk_nb, 128), 2)
    j_local = blk * 128 + lane
    lane1 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2) + 1
             ).astype(jnp.float32)
    r_lane = jnp.exp(np.float32(np.log(agc_release)) * lane1) \
        if agc_release < 1.0 else jnp.ones((1, 1, 128), jnp.float32)
    release128 = float(np.float64(agc_release) ** 128)
    if nb:
        a_lane = jnp.exp(np.float32(np.log(nb_a)) * lane1)
        nb_a128 = float(np.float64(nb_a) ** 128)
    if demod in ("am", "sam"):
        p_lane = jnp.exp(np.float32(np.log(dc_pole)) * lane1) \
            if dc_pole < 1.0 else jnp.ones((1, 1, 128), jnp.float32)
        pole128 = float(np.float64(dc_pole) ** 128)
    if nr == "spectral":
        from radiodsp_sdr_rx_tpu.ops.spectral_sub import (
            FLOOR_BETA, VAD_END_BIN, VAD_START_BIN, UNDER_FLOOR_GAIN)
        bin_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
        vad_mask = jnp.logical_and(bin_idx >= VAD_START_BIN,
                                   bin_idx <= VAD_END_BIN).astype(jnp.float32)
        a_floor = np.float32(1.0 - FLOOR_BETA)
        under_gain = np.float32(UNDER_FLOOR_GAIN)
        floor_beta = np.float32(FLOOR_BETA)

    # 2 transpose passes (16-bit exact) suffice for the LMS audio path at the
    # production "high" precision; the SAM PLL phase recurrence always needs
    # the full-f32 3-pass form (round-3 chip bisect: layout-change rounding
    # there amplifies to O(1) output error), and HIGHEST (the exact-oracle
    # mode) keeps the transposes exact too.
    tr_passes = 3 if (demod == "sam"
                      or precision == jax.lax.Precision.HIGHEST) else 2

    def to_lanes(x3, out_ref, base: int = 0):
        """(128, nb, 128) value -> (nb*128 time, 128 ch) scratch via MXU.
        ``base`` selects the slot row offset (the pipelined SAM driver keeps
        two chunk slots in t_buf/t_buf2)."""
        ident = ident_ref[:]
        for j in range(chunk_nb):
            out_ref[base + j * 128:base + (j + 1) * 128, :] = _transpose_mxu(
                x3[:, j, :], ident, passes=tr_passes)

    def from_lanes(in_ref, base: int = 0):
        """(nb*128, 128 ch) scratch -> (128, nb, 128) value via MXU."""
        ident = ident_ref[:]
        blocks = [
            _transpose_mxu(in_ref[base + j * 128:base + (j + 1) * 128, :],
                           ident, passes=tr_passes)[:, None, :]
            for j in range(chunk_nb)
        ]
        return jnp.concatenate(blocks, axis=1)

    def lms_stage(t, y3):
        """Grouped NLMS over the chunk, INTERLEAVED with the MXU layout
        transposes: the forward transpose of 128-block j+1 and the back
        transpose of block j's output issue between block j's macro loop and
        block j+1's, so the MXU work overlaps the (VPU-bound) NLMS serial
        stream instead of serializing before/after it.

        y3 is the (cb, chunk_nb, 128) channel-major input; returns the
        channel-major output (y for "denoise", e for "notch"). The
        128-sample-delayed desired stream (RDSP_noise_reduction.h:66-80
        semantics via ops/lms.py) is read DIRECTLY from the pristine t_buf
        (this chunk, 128 rows back) or lms_prev (previous chunk's last 128
        input rows) — no chunk-sized staging copy. First-block quirk: the
        stream's very first 128 samples predict themselves."""
        first = flags_ref[0, 0]
        nfirst = 128 // group   # macro steps whose desired predates the chunk
        bpg = 128 // group      # macro steps per 128-block
        last_m = chunk_nb * bpg - 1

        def desired(m, xs, static):
            """128-sample-delayed desired rows for macro ``m``, read directly
            from the pristine t_buf (this chunk, 128 rows back) or lms_prev
            (previous chunk's last 128 input rows) — no chunk-sized staging
            copy. First-block quirk: the stream's very first 128 samples
            predict themselves."""
            if static:
                p = m * group
                ds = (t_buf[p - 128:p - 128 + group, :] if m >= nfirst
                      else lms_prev[p:p + group, :])
                early = m < nfirst
            else:
                pd = m * group
                d_cur = t_buf[pl.ds(jnp.maximum(pd - 128, 0), group), :]
                d_prev = lms_prev[pl.ds(jnp.minimum(pd, 128 - group),
                                        group), :]
                ds = jnp.where(m < nfirst, d_prev, d_cur)
                early = None
            quirk = jnp.logical_and(first > 0.5, t == 0)
            if early is None:
                ds = jnp.where(jnp.logical_and(m < nfirst, quirk), xs, ds)
            elif early:
                ds = jnp.where(quirk, xs, ds)
            return ds

        def macro_v4(m, carry, static: bool, rebase: bool = False):
            """One macro step on the v4 telescoped-R macro (needs ``group``
            lookahead rows — every macro but the chunk's last has them in
            t_buf because block j+1 is transposed in before block j's macros
            run). ``static=True`` (production): all slice offsets are
            compile-time constants — no dynamic-slice lowering on the hot
            path, and no fori_loop region boundary between macro steps, so
            the scheduler can mix the interleaved MXU transposes into the
            VPU-bound macro stream. ``static=False`` is the numerically
            identical fori-loop twin (same op order) used in interpret mode,
            where full unrolling makes tracing intractable; rebase macros
            (every 128-row block start, bounding the R register's
            incremental rounding drift) are peeled out of the fori at static
            positions so the twin stays exact. (A variant that read the
            window tile straight from a head-extended t_buf measured no
            faster and blew compile time to ~20 min — the register-carried
            window is the sweet spot.)"""
            w, win, r_reg = carry
            if static:
                p = m * group
                xs2 = t_buf[p:p + 2 * group, :]
            else:
                xs2 = t_buf[pl.ds(m * group, 2 * group), :]
            xs = xs2[:group, :]
            ds = desired(m, xs, static)
            tile = jnp.concatenate([win, xs2], axis=0)
            # the macro before a rebase (or before the chunk-final v3 macro)
            # does not need to emit r_out; only macros whose successor is a
            # carried v4 macro do. Successor m+1 rebases iff (m+1) % bpg ==
            # 0, and m+1 == last_m runs v3 — static in both loop forms for
            # the static path; the fori body conservatively always emits
            # (its successors are interior carried macros except the final
            # iteration, whose emit is one wasted (U, C) FMA pair).
            emit = True
            if static:
                emit = ((m + 1) % bpg != 0) and (m + 1 != last_m)
            y, e, w, r_reg = _grouped_macro_r(
                tile, ds, w, np.float32(mu), taps=taps, group=group,
                r_in=None if rebase else r_reg, emit_r=emit)
            out = y if nr == "denoise" else e
            if static:
                d_buf[p:p + group, :] = out
            else:
                d_buf[pl.ds(m * group, group), :] = out
            return (w, tile[group:group + taps, :], r_reg)

        def macro_v3(m, carry):
            """The chunk's LAST macro: no lookahead rows exist, so it runs
            the self-contained v3 macro (fresh sliding pass + per-diagonal
            telescopes). Always at a static position (peeled in both loop
            forms)."""
            w, win, r_reg = carry
            p = m * group
            xs = t_buf[p:p + group, :]
            ds = desired(m, xs, static=True)
            tile = jnp.concatenate([win, xs], axis=0)
            y, e, w = _grouped_macro(tile, ds, w, np.float32(mu),
                                     taps=taps, group=group)
            d_buf[p:p + group, :] = y if nr == "denoise" else e
            return (w, tile[group:, :], r_reg)

        ident = ident_ref[:]
        t_buf[0:128, :] = _transpose_mxu(y3[:, 0, :], ident,
                                         passes=tr_passes)
        # R register dummy until the first (always-rebase) macro overwrites
        carry = (lms_w[:], lms_win[:],
                 jnp.zeros((group, LANES), jnp.float32))
        out_blocks = []
        for j in range(chunk_nb):
            if j + 1 < chunk_nb:
                t_buf[(j + 1) * 128:(j + 2) * 128, :] = _transpose_mxu(
                    y3[:, j + 1, :], ident, passes=tr_passes)
            if unroll_lms:
                for m in range(j * bpg, (j + 1) * bpg):
                    if m == last_m:
                        carry = macro_v3(m, carry)
                    else:
                        carry = macro_v4(m, carry, static=True,
                                         rebase=(m % bpg == 0))
            else:
                m0 = j * bpg
                if m0 == last_m:
                    carry = macro_v3(m0, carry)
                else:
                    # peel the block-start rebase macro (static position)
                    carry = macro_v4(m0, carry, static=True, rebase=True)
                    hi = (j + 1) * bpg - (1 if j == chunk_nb - 1 else 0)
                    if hi > m0 + 1:
                        carry = jax.lax.fori_loop(
                            m0 + 1, hi,
                            lambda m, cy: macro_v4(m, cy, static=False),
                            carry)
                    if j == chunk_nb - 1 and last_m > m0:
                        carry = macro_v3(last_m, carry)
            out_blocks.append(_transpose_mxu(
                d_buf[j * 128:(j + 1) * 128, :], ident,
                passes=tr_passes)[:, None, :])
        lms_w[:] = carry[0]
        lms_win[:] = carry[1]
        lms_prev[:] = t_buf[chunk - 128:chunk, :]
        return jnp.concatenate(out_blocks, axis=1)

    def sam_stage(bufs=None, inter_blocks=()):
        """Second-order PLL over ``bufs`` = (zr_ref, zi_ref) (chunk, C)
        scratch (default t_buf/t_buf2); the in-phase product overwrites
        zr_ref IN PLACE (each zr row is read by its own PLL step before
        that step stores vr to the same row — exact, and saves a
        chunk-sized VMEM buffer). Constants per ops/demod.demod_sam.

        ``inter_blocks``: emission closures (the pipelined driver's NEXT-
        chunk front-end work) run immediately BEFORE the serial loop.
        (A finer-grained variant that interleaved them one per 128-step
        PLL block — the LMS macro stream's pattern — crashed the remote
        Mosaic compiler at every chunk size tried (512/1024/2048, opaque
        subprocess exit, round 5); matmuls embedded between serial PLL
        groups appear to be the trigger, since the same total op count
        with the fronts hoisted compiles fine.)"""
        zr_ref, zi_ref = bufs if bufs is not None else (t_buf, t_buf2)
        static = unroll_lms and chunk <= 2048
        for blk_fn in inter_blocks:
            blk_fn()

        # 2-D row slices (1, 128): keeps every loop value at the backend's
        # native 2-D vector shape. static unroll (production): compile-time
        # row indices instead of a dynamic slice per serial step — the same
        # lowering win as the LMS macro stream (round 5; gated off in
        # interpret mode where full unrolling makes tracing intractable)
        def put(n, vr):
            if isinstance(n, int):
                zr_ref[n:n + 1, :] = vr
            else:
                zr_ref[pl.ds(n, 1), :] = vr

        phase, freq = _pll_loop(
            chunk,
            lambda n: zr_ref[n:n + 1, :] if isinstance(n, int)
            else zr_ref[pl.ds(n, 1), :],
            lambda n: zi_ref[n:n + 1, :] if isinstance(n, int)
            else zi_ref[pl.ds(n, 1), :],
            put,
            pll_st[pl.ds(0, 1), :], pll_st[pl.ds(1, 1), :],
            kp=pll_kp, ki=pll_ki, max_freq=pll_max_freq,
            static=static)
        pll_st[pl.ds(0, 1), :] = phase
        pll_st[pl.ds(1, 1), :] = freq

    def agc_block(audio):
        run_e = _env_lanes(jnp.abs(audio), agc_release)
        seq_e = jnp.concatenate(
            [env_carry[:][:, 0:1], run_e[:, :-1, 127]], axis=1)
        carry_e = _env_rows(seq_e, release128)
        envl = jnp.maximum(run_e, carry_e[:, :, None] * r_lane)
        env_carry[:] = jnp.broadcast_to(
            envl[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
        if not agc_enabled:
            return audio
        gain = jnp.minimum(
            np.float32(agc_target) / jnp.maximum(envl, np.float32(1e-12)),
            np.float32(agc_max_gain))
        return audio * gain

    def pbt_block(audio_g):
        prev_a = jnp.concatenate(
            [audio_tail[:][:, None, :], audio_g[:, :-1, :]], axis=1)
        frames2 = jnp.concatenate([prev_a, audio_g], axis=-1)
        lr = mxu_dot(
            frames2.reshape(cb * chunk_nb, 256), wpbt_ref[:], precision,
        ).reshape(cb, chunk_nb, 256)
        audio_tail[:] = audio_g[:, chunk_nb - 1, :]
        return lr

    def spectral_stage(l, r):
        """Backup-engine spectral subtraction on the post-PBT stereo block
        (semantics identical to ops/pallas_sweep_spec._spec_chain_kernel:
        forward DFT matmul, VAD-band floor, one-pole noise floor across
        frames, under-floor gate, inverse matmul)."""
        prev_l = jnp.concatenate([st_l[:][:, None, :], l[:, :-1, :]], axis=1)
        prev_rr = jnp.concatenate([st_r[:][:, None, :], r[:, :-1, :]], axis=1)
        ff = jnp.concatenate([prev_l, l, prev_rr, r], axis=-1)
        spec = mxu_dot(
            ff.reshape(cb * chunk_nb, 512), wsf_ref[:], precision,
        ).reshape(cb, chunk_nb, 512)
        st_l[:] = l[:, chunk_nb - 1, :]
        st_r[:] = r[:, chunk_nb - 1, :]
        sr = spec[..., :256]
        si = spec[..., 256:]
        mag = jnp.sqrt(sr * sr + si * si)
        floor_est = jnp.sum(mag * vad_mask, axis=-1) * np.float32(nr_gain)
        bv = floor_beta * floor_est                          # (cb, nb)
        col0 = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk_nb), 1)
                == 0).astype(jnp.float32)
        bv = bv + (a_floor * nfl_carry[:][:, 0:1]) * col0
        nfloor = _iir_rows(bv, float(a_floor))
        nfl_carry[:] = jnp.broadcast_to(
            nfloor[:, chunk_nb - 1:chunk_nb], (cb, 128))
        nf = jnp.maximum(nfloor, 0.0)[:, :, None]
        scale = jnp.where(mag <= nf, under_gain,
                          1.0 - nf / jnp.maximum(mag, np.float32(1e-20)))
        s2 = jnp.concatenate([sr * scale, si * scale], axis=-1)
        ylr = mxu_dot(
            s2.reshape(cb * chunk_nb, 512), wsi_ref[:], precision,
        ).reshape(cb, chunk_nb, 256)
        return ylr[..., :128], ylr[..., 128:]

    def mix_filter(t, slot):
        """DMA-wait + NCO mix + NB + overlap-save filter for chunk ``t``
        (reads buf slot ``slot``; threads the tail_r/tail_i framing and NB
        carries). Returns the filter/demod-operator output y."""
        cr, ci = dma_in(slot, t)
        cr.wait()
        ci.wait()

        # ---- NCO mix ----
        phase = ph0 + (t * (chunk_nb * 128) + j_local) * inc
        ang = phase.astype(jnp.float32) * _PHASE_SCALE
        c, s = jnp.cos(ang), jnp.sin(ang)
        xr = buf_r[slot]
        xi = buf_i[slot]
        if scaled:
            xr = xr * g_i
            xi = xi * g_q

        if nb:
            # ---- noise blanker (AudioSDR NB, RadioDSP_SDR_RX.ino:129-131):
            # decaying-sum running-average magnitude, zero outliers ----
            mag = jnp.sqrt(xr * xr + xi * xi)
            run_a = _iir_lanes(np.float32(1.0 - nb_a) * mag, nb_a)
            seq_a = jnp.concatenate(
                [nbavg[:][:, 0:1], run_a[:, :-1, 127]], axis=1)
            carry_a = _iir_rows(seq_a, nb_a128)
            avg = run_a + carry_a[:, :, None] * a_lane
            keep = mag <= avg * np.float32(nb_thresh) + np.float32(1e-12)
            zero = jnp.zeros_like(xr)
            xr = jnp.where(keep, xr, zero)
            xi = jnp.where(keep, xi, zero)
            nbavg[:] = jnp.broadcast_to(
                avg[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
            nbmask[:] = keep[:, chunk_nb - 1, :].astype(jnp.float32)

        br = xr * c + xi * s
        bi = xi * c - xr * s

        # ---- overlap-save filter (+ fused SSB demod for demod="ssb") ----
        prev_r = jnp.concatenate([tail_r[:][:, None, :], br[:, :-1, :]], axis=1)
        prev_i = jnp.concatenate([tail_i[:][:, None, :], bi[:, :-1, :]], axis=1)
        frames = jnp.concatenate([prev_r, br, prev_i, bi], axis=-1)
        w_out = 128 if demod == "ssb" else 256
        y = mxu_dot(
            frames.reshape(cb * chunk_nb, 512), w_ref[:], precision,
        ).reshape(cb, chunk_nb, w_out)
        tail_r[:] = br[:, chunk_nb - 1, :]
        tail_i[:] = bi[:, chunk_nb - 1, :]
        return y

    def dc_block(env):
        """DC blocker y[n] = env[n]-env[n-1] + pole*y[n-1] as decaying-sum
        doubling scan (same construction as pallas_sweep AM demod)."""
        shifted = jnp.concatenate(
            [jnp.zeros((cb, chunk_nb, 1), env.dtype), env[..., :-1]],
            axis=-1)
        row_prev = jnp.concatenate(
            [dcx[:][:, 0:1], env[:, :-1, 127]], axis=1)   # (cb, nb)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
                 == 0).astype(env.dtype)
        diff = env - (shifted + row_prev[:, :, None] * lane0)
        run = _iir_lanes(diff, dc_pole)
        seq = jnp.concatenate(
            [dcy[:][:, 0:1], run[:, :-1, 127]], axis=1)
        carry_in = _iir_rows(seq, pole128)
        audio = run + carry_in[:, :, None] * p_lane
        dcx[:] = jnp.broadcast_to(
            env[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
        dcy[:] = jnp.broadcast_to(
            audio[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
        return audio

    def emit_out(t, out_l, out_r):
        """Single-slot output staging with a DEFERRED wait: chunk t's store
        DMA drains while chunk t+1 computes; we only block right before
        overwriting the staging buffer (or after the loop, for the last
        chunk) — halves the output VMEM vs a 2-slot ring AND overlaps the
        store with compute."""
        if isinstance(t, int):
            if t > 0:
                for d in dma_out(t - 1):
                    d.wait()
        else:
            @pl.when(t > 0)
            def _():
                for d in dma_out(t - 1):
                    d.wait()
        buf_l[0] = out_l * out_gain
        if out_r is not None:
            buf_ro[0] = out_r * out_gain
        for d in dma_out(t):
            d.start()

    def process(t, slot: int):
        @pl.when(t + 1 < n_chunks)
        def _():
            nr_, ni_ = dma_in(1 - slot, t + 1)
            nr_.start()
            ni_.start()

        y = mix_filter(t, slot)

        # ---- demodulate -> audio (cb, nb, 128) ----
        if demod == "ssb":
            audio = y
        else:
            if demod == "sam":
                # band-passed planar IQ -> lanes, PLL (in place over t_buf),
                # back; the in-phase product is the envelope
                to_lanes(y[..., :128], t_buf)
                to_lanes(y[..., 128:], t_buf2)
                sam_stage()
                env = from_lanes(t_buf)
            else:  # am: |z| envelope
                zr = y[..., :128]
                zi = y[..., 128:]
                env = jnp.sqrt(zr * zr + zi * zi)
            audio = dc_block(env)

        # ---- NR / AGC / PBT in the ReceiverBank stage order ----
        if nr == "notch":
            audio = lms_stage(t, audio)   # between demod and AGC
        audio_g = agc_block(audio)
        lr = pbt_block(audio_g)
        if nr == "denoise":
            # post-PBT LMS predictor, x1.1 makeup, mono R<-L
            out_l = lms_stage(t, lr[..., :128]) * np.float32(1.1)
            out_r = None
        elif nr == "spectral":
            out_l, out_r = spectral_stage(lr[..., :128], lr[..., 128:])
        else:
            out_l = lr[..., :128]
            out_r = lr[..., 128:]

        emit_out(t, out_l, out_r)

    if sam_pipe:
        # ---- software-pipelined SAM driver (round 5) ----
        # The serial PLL is latency-bound (the VPU idles between dependent
        # ops) while the skeleton around it (mix cos/sin, filter matmul,
        # MXU tile transposes, DC/AGC/PBT) is throughput work with no data
        # dependence on the NEIGHBORING chunk's PLL. Chunk t+1's front end
        # is emitted in per-128-block PIECES between chunk t's PLL step
        # groups (sam_stage inter_blocks) — coarse whole-front emission
        # before the PLL measured only +3% (the scheduler does not reach
        # across whole-chunk op distances); the fine-grained interleave is
        # the same pattern that carries the LMS macro stream. The two chunk
        # slots live in SEPARATE scratch refs (t_buf/t_buf2 vs t_zr1/t_zi1)
        # so the pieces carry no false ref dependencies into the stream.
        # Chip ablation (docs/PERFORMANCE.md round 5): full 1253 /
        # detector-stub 1977 / skeleton 2861 Ms/s at 128 ch — the non-PLL
        # work is ~44% of the serial wall.
        slot_bufs = ((t_buf, t_buf2), (t_zr1, t_zi1))

        def sam_front(t, slot: int, prefetch: bool):
            if prefetch:
                nr_, ni_ = dma_in(1 - slot, t + 1)
                nr_.start()
                ni_.start()
            y = mix_filter(t, slot)
            zr_ref, zi_ref = slot_bufs[slot]
            to_lanes(y[..., :128], zr_ref)
            to_lanes(y[..., 128:], zi_ref)

        def sam_back(t, slot: int):
            env = from_lanes(slot_bufs[slot][0])
            lr = pbt_block(agc_block(dc_block(env)))
            emit_out(t, lr[..., :128], lr[..., 128:])

        # n_chunks is even and >= 2 (the wrapper picks chunk_t so)
        sam_front(0, 0, prefetch=True)

        def pipe_body(u, _):
            t = 2 * u
            sam_front(t + 1, 1, prefetch=True)
            sam_stage(slot_bufs[0])
            sam_back(t, 0)
            sam_front(t + 2, 0, prefetch=True)
            sam_stage(slot_bufs[1])
            sam_back(t + 1, 1)
            return 0

        jax.lax.fori_loop(0, n_chunks // 2 - 1, pipe_body, 0)
        t_last = n_chunks - 2
        sam_front(n_chunks - 1, 1, prefetch=False)
        sam_stage(slot_bufs[0])
        sam_back(t_last, 0)
        sam_stage(slot_bufs[1])
        sam_back(n_chunks - 1, 1)
    else:
        def body(u, _):
            process(2 * u, 0)
            process(2 * u + 1, 1)
            return 0

        jax.lax.fori_loop(0, n_chunks // 2, body, 0)
        if n_chunks % 2:
            process(n_chunks - 1, 0)
    for d in dma_out(n_chunks - 1):   # drain the last chunk's store
        d.wait()

    atail_out_ref[:] = audio_tail[:]
    env_out_ref[:] = env_carry[:]
    if lms:
        w_lms_out[:] = lms_w[:]
        win_lms_out[:] = lms_win[:]
        delay_out[:] = lms_prev[:]
    else:
        w_lms_out[:] = jnp.zeros_like(w_lms_out)
        win_lms_out[:] = jnp.zeros_like(win_lms_out)
        delay_out[:] = jnp.zeros_like(delay_out)
    if demod in ("am", "sam"):
        dcx_out_ref[:] = dcx[:]
        dcy_out_ref[:] = dcy[:]
    else:
        dcx_out_ref[:] = jnp.zeros_like(dcx_out_ref)
        dcy_out_ref[:] = jnp.zeros_like(dcy_out_ref)
    if demod == "sam":
        pll_out_ref[:] = pll_st[:]
    else:
        pll_out_ref[:] = jnp.zeros_like(pll_out_ref)
    if nr == "spectral":
        nfl_out_ref[:] = nfl_carry[:]
        stl_out_ref[:] = st_l[:]
        str_out_ref[:] = st_r[:]
    else:
        nfl_out_ref[:] = jnp.zeros_like(nfl_out_ref)
        stl_out_ref[:] = jnp.zeros_like(stl_out_ref)
        str_out_ref[:] = jnp.zeros_like(str_out_ref)
    nbavg_out_ref[:] = nbavg[:] if nb else jnp.zeros_like(nbavg_out_ref)
    nbmask_out_ref[:] = nbmask[:] if nb else jnp.ones_like(nbmask_out_ref)


def sweep_lanes_chain(
    xr: jax.Array,
    xi: jax.Array,
    inc: jax.Array,
    phase0: jax.Array,
    w: jax.Array,
    w_pbt: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
    audio_tail: jax.Array,
    env0: jax.Array,
    *,
    stage: str | None = None,
    demod: str | None = None,
    nr: str | None = None,
    agc_release: float,
    agc_target: float,
    agc_max_gain: float,
    agc_enabled: bool = True,
    out_gain: float = 1.0,
    chunk_t: int = 1024,
    interpret: bool = False,
    in_gain: float = 1.0,
    iq_balance: float = 1.0,
    # lms ("denoise"/"notch")
    lms_weights: jax.Array | None = None,   # (taps, 128)
    lms_window: jax.Array | None = None,    # (taps, 128)
    lms_delay_block: jax.Array | None = None,  # (128, 128) (time, C)
    lms_first: jax.Array | None = None,     # () bool
    mu: float = 0.0,
    group: int = 16,
    # am / sam demod
    dc0: jax.Array | None = None,           # (C, 2) [env_prev, y_prev]/chan
    pll0: jax.Array | None = None,          # (2, 128) [phase | freq] on lanes
    dc_pole: float = 0.995,
    pll_bw_hz: float = 100.0,
    sample_rate: float = 44117.64706,
    # noise blanker (pre-mix, AudioSDR NB)
    nb: bool = False,
    nb_thresh_db: float = 10.0,
    nb_tau: float = 512.0,
    nb_avg0: jax.Array | None = None,       # (C,)
    nb_mask0: jax.Array | None = None,      # (C, 128)
    # spectral NR
    w_spec_fwd: jax.Array | None = None,    # (512, 512)
    w_spec_inv: jax.Array | None = None,    # (512, 256)
    nfloor0: jax.Array | None = None,       # (C,)
    spec_tail_l: jax.Array | None = None,   # (C, 128)
    spec_tail_r: jax.Array | None = None,   # (C, 128)
    nr_level: float = 0.0,
    precision=jax.lax.Precision.HIGHEST,
    unroll_lms: bool | None = None,
):
    """Whole 128-lane receive chain with demod x NR folded in.

    Select either via the legacy ``stage`` shorthand ("denoise" = ssb+lms-y,
    "notch" = ssb+lms-e, "sam" = sam+none, "none" = ssb+none) or explicitly
    via ``demod`` in ("ssb", "am", "sam") and ``nr`` in ("none", "denoise",
    "notch", "spectral") — every reference-legal combination
    (RadioDSP_SDR_RX.ino:198 applies NR to every mode's audio).

    All channel-axis operands must be the full lane width (C == 128; pad
    smaller banks — zero channels adapt to zero). Returns
    (audio_l, audio_r_or_None, audio_tail', env', lms_w', lms_win',
    lms_delay_block', dc', pll', nfloor', spec_tail_l', spec_tail_r') —
    unused state slots return zeros.
    """
    if stage is not None:
        if demod is not None or nr is not None:
            raise ValueError("pass either stage= or demod=/nr=, not both")
        demod, nr = {
            "denoise": ("ssb", "denoise"),
            "notch": ("ssb", "notch"),
            "sam": ("sam", "none"),
            "none": ("ssb", "none"),
        }[stage]
    if demod not in ("ssb", "am", "sam"):
        raise ValueError(f"demod {demod!r}")
    if nr not in ("none", "denoise", "notch", "spectral"):
        raise ValueError(f"nr {nr!r}")
    c, n = xr.shape
    if c % LANES:
        raise ValueError(f"channel axis must be a multiple of {LANES} (pad); "
                         f"got {c}")
    inc = jax.lax.bitcast_convert_type(jnp.asarray(inc, jnp.uint32), jnp.int32)
    phase0 = jax.lax.bitcast_convert_type(jnp.asarray(phase0, jnp.uint32),
                                          jnp.int32)
    chunk_t = _even_chunks(n, chunk_t)
    if demod == "sam" and nr == "none" and (n // chunk_t) % 2 and n > chunk_t:
        # the pipelined SAM driver wants an even chunk count: halve the
        # chunk once (n is a multiple of 128*2^k by _even_chunks's
        # construction, so this keeps divisibility)
        if chunk_t % 256 == 0 and n % (chunk_t // 2) == 0:
            chunk_t //= 2
    chunk_nb = chunk_t // 128
    n_chunks = n // chunk_t
    sam_pipe = (demod == "sam" and nr == "none"
                and n_chunks % 2 == 0 and n_chunks >= 2)
    lms = nr in ("denoise", "notch")
    taps = int(lms_weights.shape[0]) if lms else 8
    if lms and chunk_t % group:
        raise ValueError(f"chunk_t {chunk_t} not a multiple of group {group}")
    if lms and 128 % group:
        # the interleaved macro stream walks bpg = 128 // group blocks per
        # 128-row tile; a non-divisor would silently skip rows (ADVICE r4)
        raise ValueError(f"group {group} must divide the 128-row tile")

    wn = 2.0 * np.pi * pll_bw_hz / sample_rate
    kp = float(2.0 * 0.70710678 * wn)
    ki = float(wn * wn)
    max_freq = float(2.0 * np.pi * 2000.0 / sample_rate)

    x3r = xr.reshape(c, n // 128, 128)
    x3i = xi.reshape(c, n // 128, 128)
    w_out = 128 if demod == "ssb" else 256
    emit_r = nr != "denoise"
    spectral = nr == "spectral"
    # mean over the VAD band divides by (end-start): 150 for 151 bins — the
    # reference's own off-by-one, replicated (RDSP_convolutional_spec.h:200)
    from radiodsp_sdr_rx_tpu.ops.spectral_sub import VAD_END_BIN, VAD_START_BIN
    nr_gain = float(nr_level) * 1.5 / float(VAD_END_BIN - VAD_START_BIN)

    if lms:
        w_in = jnp.asarray(lms_weights, jnp.float32)
        win_in = jnp.asarray(lms_window, jnp.float32)
        dly_in = jnp.asarray(lms_delay_block, jnp.float32)
        flags = jnp.asarray(lms_first, jnp.float32).reshape(1, 1)
    else:
        w_in = jnp.zeros((taps, c), jnp.float32)
        win_in = jnp.zeros((taps, c), jnp.float32)
        dly_in = jnp.zeros((128, c), jnp.float32)
        flags = jnp.zeros((1, 1), jnp.float32)
    dc_in = (jnp.asarray(dc0, jnp.float32) if demod in ("am", "sam")
             else jnp.zeros((c, 2), jnp.float32))
    pll_in = (jnp.asarray(pll0, jnp.float32) if demod == "sam"
              else jnp.zeros((2, c), jnp.float32))
    if spectral:
        wsf_in = jnp.asarray(w_spec_fwd, jnp.float32)
        wsi_in = jnp.asarray(w_spec_inv, jnp.float32)
        nfl_in = jnp.asarray(nfloor0, jnp.float32)
        stl_in = jnp.asarray(spec_tail_l, jnp.float32)
        str_in = jnp.asarray(spec_tail_r, jnp.float32)
    else:
        wsf_in = jnp.zeros((8, 128), jnp.float32)
        wsi_in = jnp.zeros((8, 128), jnp.float32)
        nfl_in = jnp.zeros((c,), jnp.float32)
        stl_in = jnp.zeros((c, 128), jnp.float32)
        str_in = jnp.zeros((c, 128), jnp.float32)

    import math as _math
    if nb_avg0 is None:
        nb_avg0 = jnp.zeros((c,), jnp.float32)
    if nb_mask0 is None:
        nb_mask0 = jnp.ones((c, 128), jnp.float32)
    kernel = functools.partial(
        _lanes_chain_kernel, chunk_nb=chunk_nb, n_chunks=n_chunks,
        out_gain=float(out_gain), agc_release=float(agc_release),
        agc_target=float(agc_target), agc_max_gain=float(agc_max_gain),
        agc_enabled=bool(agc_enabled), demod=demod, nr=nr, mu=float(mu),
        group=int(group), taps=taps, nr_gain=nr_gain, dc_pole=float(dc_pole),
        pll_kp=kp, pll_ki=ki, pll_max_freq=max_freq,
        in_gain=float(in_gain), iq_balance=float(iq_balance),
        nb=bool(nb), nb_thresh=float(10.0 ** (nb_thresh_db / 20.0)),
        nb_a=float(_math.exp(-1.0 / nb_tau)),
        precision=precision,
        # full static unrolling of the LMS macro stream is the production
        # default; interpret mode (CPU tests) keeps the numerically
        # identical fori-loop twin — tracing 64+ unrolled macros per chunk
        # is intractable there
        unroll_lms=(not interpret) if unroll_lms is None else unroll_lms)

    def cspec(rows):
        """Per-lane-group block on the channel (first) axis."""
        return pl.BlockSpec((rows, 128), lambda ci: (ci, 0),
                            memory_space=pltpu.VMEM)

    def lspec(rows):
        """Per-lane-group block on the lane (second) axis."""
        return pl.BlockSpec((rows, LANES), lambda ci: (0, ci),
                            memory_space=pltpu.VMEM)

    def shared(shape):
        return pl.BlockSpec(shape, lambda ci: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    col = pl.BlockSpec((LANES, 1), lambda ci: (ci, 0),
                       memory_space=pltpu.VMEM)
    ident = jnp.eye(128, dtype=jnp.float32)
    buf = pltpu.VMEM((2, LANES, chunk_nb, 128), jnp.float32)
    # output staging is SINGLE-slot (deferred wait in the kernel) — the input
    # ring stays 2-slot for prefetch; this is what lets chunk_t 2048+ fit VMEM
    buf_lo = pltpu.VMEM((1, LANES, chunk_nb, 128), jnp.float32)
    buf_ro = buf_lo if emit_r else pltpu.VMEM((1, 1, 1, 128), jnp.float32)
    r_blocks = n // 128 if emit_r else 1
    sem = pltpu.SemaphoreType.DMA((2,))
    sem1 = pltpu.SemaphoreType.DMA((1,))
    cvec = pltpu.VMEM((LANES, 128), jnp.float32)
    tchunk = pltpu.VMEM((chunk_t, 128), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(c // LANES,),
        in_specs=[
            col, col,
            cspec(LANES), cspec(LANES), cspec(LANES), col,
            lspec(taps), lspec(taps), lspec(128),
            shared((1, 1)), col, col, lspec(2),
            col, cspec(LANES), cspec(LANES),
            col, cspec(LANES),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            shared((512, w_out)), shared((256, 256)),
            shared(tuple(wsf_in.shape)), shared(tuple(wsi_in.shape)),
            shared((128, 128)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            cspec(LANES), cspec(LANES),
            lspec(taps), lspec(taps), lspec(128),
            cspec(LANES), cspec(LANES), lspec(2),
            cspec(LANES), cspec(LANES), cspec(LANES),
            cspec(LANES), cspec(LANES),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, r_blocks, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((taps, c), jnp.float32),
            jax.ShapeDtypeStruct((taps, c), jnp.float32),
            jax.ShapeDtypeStruct((128, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((2, c), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            buf, buf, buf_lo, buf_ro, sem, sem, sem1, sem1,
            cvec, cvec, cvec, cvec,
            tchunk,                                      # t_buf
            # d_buf: the lms stage's (time, C) output staging
            tchunk if lms else pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((taps, 128), jnp.float32),
            pltpu.VMEM((taps, 128), jnp.float32),
            pltpu.VMEM((128, 128), jnp.float32),
            cvec, cvec,
            pltpu.VMEM((2, 128), jnp.float32),
            # t_buf2: SAM's imaginary plane only
            tchunk if demod == "sam" else pltpu.VMEM((8, 128), jnp.float32),
            cvec, cvec, cvec,   # nfl_carry, st_l, st_r (spectral)
            cvec, cvec,         # nbavg, nbmask (noise blanker)
            # t_zr1/t_zi1: the pipelined SAM driver's second chunk slot
            # (separate refs so the interleaved front pieces carry no false
            # ref dependencies into the PLL stream)
            tchunk if sam_pipe else pltpu.VMEM((8, 128), jnp.float32),
            tchunk if sam_pipe else pltpu.VMEM((8, 128), jnp.float32),
        ],
        # the backend's 16 MB scoped-VMEM DEFAULT is what rejected chunk_t
        # 2048+ all of rounds 3-4 (misdiagnosed as VMEM-budget math: the
        # failures were opaque remote-compiler exits until one surfaced as
        # an AOT "scoped vmem limit" OOM). v5e has far more physical VMEM;
        # raising the limit compiles chunk 2048 and clears the 2 Gs/s bar
        # on the notch config (measured 2046 Ms/s, round 4).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(inc[:, None], phase0[:, None], tail_r, tail_i, audio_tail,
      jnp.asarray(env0, jnp.float32)[:, None],
      w_in, win_in, dly_in, flags, dc_in[:, 0:1], dc_in[:, 1:2], pll_in,
      nfl_in[:, None], stl_in, str_in,
      jnp.asarray(nb_avg0, jnp.float32)[:, None],
      jnp.asarray(nb_mask0, jnp.float32),
      x3r, x3i, w, w_pbt, wsf_in, wsi_in, ident)
    (audio_l, audio_r, atail, env_out, w_out_a, win_out, dly_out,
     dcx_out, dcy_out, pll_out, nfl_out, stl_out, str_out,
     nbavg_out, nbmask_out) = outs
    audio_l = audio_l.reshape(c, n)
    audio_r = audio_r.reshape(c, n) if emit_r else None
    dc_next = jnp.stack([dcx_out[:, 0], dcy_out[:, 0]], axis=-1)
    base = (audio_l, audio_r, atail, env_out[:, 0],
            w_out_a, win_out, dly_out, dc_next, pll_out,
            nfl_out[:, 0], stl_out, str_out)
    if nb:
        # extended return with the blanker carries (see the sweep kernels)
        return base + (nbavg_out[:, 0], nbmask_out)
    return base
