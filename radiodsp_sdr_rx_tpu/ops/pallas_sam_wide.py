"""Sublane-parallel SAM chain: G lane groups advance through ONE PLL stream.

The SAM carrier PLL (ops/pallas_sam.py) is the chain's only true per-sample
serial recurrence (~130 cycles/step, latency-bound). The round-3 folded
kernel (ops/pallas_chain_lanes.py stage="sam") pays that latency once per
128-channel lane group — a 1024-channel bank runs 8 sequential lane groups
and therefore 8x the serial latency (VERDICT r3 #2).

This kernel restructures the bank so G groups (G*128 channels) share ONE
serial step stream: the PLL state and every per-step operand is a (G, 128)
tile — on the 8x128 VPU a (8, 128) op is ONE vector register, the same
instruction count and latency as the (1, 128) row the narrow kernel uses,
but retiring 8x the channels. Layout: the band-passed planar IQ is MXU-tile-
transposed into ``(time, G, 128)`` scratch (time on the LEADING axis so the
PLL's dynamic row indexing stays on the supported leading-dim ``pl.ds``
form), the PLL stream runs once, and the in-phase product transposes back to
channel-major for the DC blocker / AGC / PBT — which all operate on the full
(G*128, nb, 128) block exactly as in ops/pallas_sweep._chain_kernel.

Chunking: the time chunk is small (default 256) because the whole G*128-
channel band must sit in VMEM per chunk; the serial PLL dominates anyway, so
DMA amortization matters less than in the linear chains.

Reference: AudioSDR SAMmode (RDSP_controls.h:372-378); loop constants per
ops/demod.demod_sam; parity vs FusedSAMBank's narrow folded kernel and
ReceiverBank in tests/test_fused_bank.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiodsp_sdr_rx_tpu.ops.mxu import mxu_dot
from radiodsp_sdr_rx_tpu.ops.pallas_chain_lanes import _transpose_mxu
from radiodsp_sdr_rx_tpu.ops.pallas_sam import _pll_loop
from radiodsp_sdr_rx_tpu.ops.pallas_sweep import (
    _PHASE_SCALE, _env_lanes, _env_rows, _even_chunks, _iir_lanes, _iir_rows,
)

LANES = 128


def _sam_wide_kernel(
    inc_ref, phase0_ref, tin_r_ref, tin_i_ref, atail_in_ref, env0_ref,
    dcx0_ref, dcy0_ref, pll0_ref, nbavg0_ref, nbmask0_ref,
    xr_hbm, xi_hbm, w_ref, wpbt_ref, ident_ref,
    l_hbm, r_hbm, atail_out_ref, env_out_ref, dcx_out_ref, dcy_out_ref,
    pll_out_ref, nbavg_out_ref, nbmask_out_ref,
    buf_r, buf_i, buf_l, buf_ro, sem_r, sem_i, sem_l, sem_ro,
    tail_r, tail_i, audio_tail, env_carry, dcx, dcy,
    zbuf_r, zbuf_i, pll_st, nbavg, nbmask,
    *, groups: int, chunk_nb: int, n_chunks: int, out_gain: float,
    agc_release: float, agc_target: float, agc_max_gain: float,
    agc_enabled: bool, dc_pole: float,
    pll_kp: float, pll_ki: float, pll_max_freq: float,
    in_gain: float, iq_balance: float,
    nb: bool, nb_thresh: float, nb_a: float, precision,
    static_pll: bool = True,
):
    """One instance = groups*128 channels; the PLL advances all of them per
    serial step. zbuf_r/zbuf_i: (chunk, G, 128) scratch (time leading);
    pll_st: (2*G, 128) [phase rows | freq rows]."""
    G = groups
    cb = G * LANES
    chunk = chunk_nb * 128
    c0 = pl.program_id(0) * cb

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
        return (
            pltpu.make_async_copy(
                buf_l.at[0],
                l_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
                sem_l.at[0]),
            pltpu.make_async_copy(
                buf_ro.at[0],
                r_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
                sem_ro.at[0]),
        )

    inc = inc_ref[:][:, :, None]
    ph0 = phase0_ref[:][:, :, None]

    g_i = np.float32(in_gain)
    g_q = np.float32(in_gain * iq_balance)
    scaled = not (in_gain == 1.0 and iq_balance == 1.0)

    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cb, 1, 128), 2)
    ang_t = ((ph0 + (lane_t - 128) * inc).astype(jnp.float32) * _PHASE_SCALE)
    ct, st_ = jnp.cos(ang_t), jnp.sin(ang_t)
    tr_in = tin_r_ref[:][:, None, :]
    ti_in = tin_i_ref[:][:, None, :]
    if scaled:
        tr_in = tr_in * g_i
        ti_in = ti_in * g_q
    if nb:
        tail_r[:] = (tr_in * ct + ti_in * st_)[:, 0, :] * nbmask0_ref[:]
        tail_i[:] = (ti_in * ct - tr_in * st_)[:, 0, :] * nbmask0_ref[:]
        nbavg[:] = jnp.broadcast_to(nbavg0_ref[:], (cb, 128))
    else:
        tail_r[:] = (tr_in * ct + ti_in * st_)[:, 0, :]
        tail_i[:] = (ti_in * ct - tr_in * st_)[:, 0, :]
    audio_tail[:] = atail_in_ref[:]
    env_carry[:] = jnp.broadcast_to(env0_ref[:], (cb, 128))
    dcx[:] = jnp.broadcast_to(dcx0_ref[:], (cb, 128))
    dcy[:] = jnp.broadcast_to(dcy0_ref[:], (cb, 128))
    pll_st[:] = pll0_ref[0]

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
    p_lane = jnp.exp(np.float32(np.log(dc_pole)) * lane1) \
        if dc_pole < 1.0 else jnp.ones((1, 1, 128), jnp.float32)
    pole128 = float(np.float64(dc_pole) ** 128)
    if nb:
        a_lane = jnp.exp(np.float32(np.log(nb_a)) * lane1)
        nb_a128 = float(np.float64(nb_a) ** 128)

    def process(t, slot: int):
        @pl.when(t + 1 < n_chunks)
        def _():
            nr, ni = dma_in(1 - slot, t + 1)
            nr.start()
            ni.start()

        cr, ci = dma_in(slot, t)
        cr.wait()
        ci.wait()

        # ---- NCO mix ----
        phase = ph0 + (t * chunk + j_local) * inc
        ang = phase.astype(jnp.float32) * _PHASE_SCALE
        c, s = jnp.cos(ang), jnp.sin(ang)
        xr = buf_r[slot]
        xi = buf_i[slot]
        if scaled:
            xr = xr * g_i
            xi = xi * g_q
        if nb:
            # noise blanker pre-mix (same fold as ops/pallas_sweep)
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

        # ---- overlap-save complex band-pass (one matmul, all G groups) ----
        # (chunk_nb == 1 keeps the frames-row count at G*128 — the remote
        # compiler crashes above 2048 rows — and needs empty-slice guards)
        if chunk_nb > 1:
            prev_r = jnp.concatenate(
                [tail_r[:][:, None, :], br[:, :-1, :]], axis=1)
            prev_i = jnp.concatenate(
                [tail_i[:][:, None, :], bi[:, :-1, :]], axis=1)
        else:
            prev_r = tail_r[:][:, None, :]
            prev_i = tail_i[:][:, None, :]
        frames = jnp.concatenate([prev_r, br, prev_i, bi], axis=-1)
        y = mxu_dot(
            frames.reshape(cb * chunk_nb, 512), w_ref[:], precision,
        ).reshape(cb, chunk_nb, 256)
        tail_r[:] = br[:, chunk_nb - 1, :]
        tail_i[:] = bi[:, chunk_nb - 1, :]

        # ---- channel-major -> (time, G, 128): 3-pass exact MXU transposes
        # (the PLL recurrence amplifies layout-change rounding; round 3) ----
        # pure-slice indexing throughout: this backend's Mosaic rejects
        # int-index+slice chains on refs/values (docs/PERFORMANCE.md)
        ident = ident_ref[:]
        for g in range(G):
            for j in range(chunk_nb):
                yg = y[g * 128:(g + 1) * 128, j:j + 1, :].reshape(128, 256)
                zbuf_r[j * 128:(j + 1) * 128, g:g + 1, :] = _transpose_mxu(
                    yg[:, :128], ident)[:, None, :]
                zbuf_i[j * 128:(j + 1) * 128, g:g + 1, :] = _transpose_mxu(
                    yg[:, 128:], ident)[:, None, :]

        # ---- ONE serial PLL stream over (G, 128) tiles ----
        def put(n, vr):
            if isinstance(n, int):
                zbuf_r[n:n + 1, :, :] = vr[None]
            else:
                zbuf_r[pl.ds(n, 1), :, :] = vr[None]

        # static=True when the chunk is small enough to unroll: every zbuf
        # access then has a compile-time row index (a dynamic (1, G, 128)
        # slice per serial step is the measured per-step cost driver at
        # G=8 — round 5)
        phase_t, freq_t = _pll_loop(
            chunk,
            lambda n: zbuf_r[pl.ds(n, 1), :, :].reshape(G, 128)
            if not isinstance(n, int) else zbuf_r[n:n + 1, :, :]
            .reshape(G, 128),
            lambda n: zbuf_i[pl.ds(n, 1), :, :].reshape(G, 128)
            if not isinstance(n, int) else zbuf_i[n:n + 1, :, :]
            .reshape(G, 128),
            put,
            pll_st[0:G, :], pll_st[G:2 * G, :],
            kp=pll_kp, ki=pll_ki, max_freq=pll_max_freq,
            static=static_pll and chunk <= 512)
        pll_st[0:G, :] = phase_t
        pll_st[G:2 * G, :] = freq_t

        # ---- back to channel-major ----
        env_groups = []
        for g in range(G):
            blocks = [
                _transpose_mxu(
                    zbuf_r[j * 128:(j + 1) * 128, g:g + 1, :]
                    .reshape(128, 128), ident)[:, None, :]
                for j in range(chunk_nb)
            ]
            env_groups.append(jnp.concatenate(blocks, axis=1))
        env = jnp.concatenate(env_groups, axis=0)          # (cb, nb, 128)

        # ---- DC blocker (decaying-sum doubling scan) ----
        shifted = jnp.concatenate(
            [jnp.zeros((cb, chunk_nb, 1), env.dtype), env[..., :-1]], axis=-1)
        row_prev = (jnp.concatenate(
            [dcx[:][:, 0:1], env[:, :-1, 127]], axis=1)
            if chunk_nb > 1 else dcx[:][:, 0:1])
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
                 == 0).astype(env.dtype)
        diff = env - (shifted + row_prev[:, :, None] * lane0)
        run = _iir_lanes(diff, dc_pole)
        seq = (jnp.concatenate([dcy[:][:, 0:1], run[:, :-1, 127]], axis=1)
               if chunk_nb > 1 else dcy[:][:, 0:1])
        carry_in = _iir_rows(seq, pole128)
        audio = run + carry_in[:, :, None] * p_lane
        dcx[:] = jnp.broadcast_to(
            env[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
        dcy[:] = jnp.broadcast_to(
            audio[:, chunk_nb - 1, :][:, 127:128], (cb, 128))

        # ---- AGC ----
        run_e = _env_lanes(jnp.abs(audio), agc_release)
        seq_e = (jnp.concatenate(
            [env_carry[:][:, 0:1], run_e[:, :-1, 127]], axis=1)
            if chunk_nb > 1 else env_carry[:][:, 0:1])
        carry_e = _env_rows(seq_e, release128)
        envl = jnp.maximum(run_e, carry_e[:, :, None] * r_lane)
        env_carry[:] = jnp.broadcast_to(
            envl[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
        if agc_enabled:
            gain = jnp.minimum(
                np.float32(agc_target) / jnp.maximum(envl, np.float32(1e-12)),
                np.float32(agc_max_gain))
            audio_g = audio * gain
        else:
            audio_g = audio

        # ---- PBT ----
        prev_a = (jnp.concatenate(
            [audio_tail[:][:, None, :], audio_g[:, :-1, :]], axis=1)
            if chunk_nb > 1 else audio_tail[:][:, None, :])
        frames2 = jnp.concatenate([prev_a, audio_g], axis=-1)
        lr = mxu_dot(
            frames2.reshape(cb * chunk_nb, 256), wpbt_ref[:], precision,
        ).reshape(cb, chunk_nb, 256)
        audio_tail[:] = audio_g[:, chunk_nb - 1, :]

        @pl.when(t > 0)
        def _():
            for d in dma_out(t - 1):
                d.wait()
        buf_l[0] = lr[..., :128] * out_gain
        buf_ro[0] = lr[..., 128:] * out_gain
        for d in dma_out(t):
            d.start()

    def body(u, _):
        process(2 * u, 0)
        process(2 * u + 1, 1)
        return 0

    jax.lax.fori_loop(0, n_chunks // 2, body, 0)
    if n_chunks % 2:
        process(n_chunks - 1, 0)
    for d in dma_out(n_chunks - 1):
        d.wait()

    atail_out_ref[:] = audio_tail[:]
    env_out_ref[:] = env_carry[:]
    dcx_out_ref[:] = dcx[:]
    dcy_out_ref[:] = dcy[:]
    pll_out_ref[0] = pll_st[:]
    nbavg_out_ref[:] = nbavg[:] if nb else jnp.zeros_like(nbavg_out_ref)
    nbmask_out_ref[:] = nbmask[:] if nb else jnp.ones_like(nbmask_out_ref)


def sweep_sam_wide(
    xr: jax.Array,
    xi: jax.Array,
    inc: jax.Array,
    phase0: jax.Array,
    w_sb: jax.Array,
    w_pbt: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
    audio_tail: jax.Array,
    env0: jax.Array,
    dc0: jax.Array,
    pll0: jax.Array,
    *,
    agc_release: float,
    agc_target: float,
    agc_max_gain: float,
    agc_enabled: bool = True,
    out_gain: float = 1.0,
    dc_pole: float = 0.995,
    pll_bw_hz: float = 100.0,
    sample_rate: float = 44117.64706,
    groups: int = 8,
    chunk_t: int = 256,
    interpret: bool = False,
    in_gain: float = 1.0,
    iq_balance: float = 1.0,
    nb: bool = False,
    nb_thresh_db: float = 10.0,
    nb_tau: float = 512.0,
    nb_avg0: jax.Array | None = None,
    nb_mask0: jax.Array | None = None,
    precision=jax.lax.Precision.HIGH,
):
    """Whole SAM chain, G lane groups per serial PLL stream.

    xr/xi: (C, n) with C a multiple of groups*128 (pad); pll0: (2, C)
    [phase | freq] rows; dc0: (C, 2). Returns (audio_l, audio_r,
    audio_tail', env', dc', pll') — same state semantics as
    ops/pallas_chain_lanes.sweep_lanes_chain stage="sam".
    """
    c, n = xr.shape
    G = int(groups)
    if c % (G * LANES):
        raise ValueError(f"channel axis {c} must be a multiple of "
                         f"groups*128 = {G * LANES} (pad)")
    inc = jax.lax.bitcast_convert_type(jnp.asarray(inc, jnp.uint32), jnp.int32)
    phase0 = jax.lax.bitcast_convert_type(jnp.asarray(phase0, jnp.uint32),
                                          jnp.int32)
    chunk_t = _even_chunks(n, chunk_t)
    chunk_nb = chunk_t // 128
    n_chunks = n // chunk_t
    x3r = xr.reshape(c, n // 128, 128)
    x3i = xi.reshape(c, n // 128, 128)

    wn = 2.0 * np.pi * pll_bw_hz / sample_rate
    kp = float(2.0 * 0.70710678 * wn)
    ki = float(wn * wn)
    max_freq = float(2.0 * np.pi * 2000.0 / sample_rate)

    # pll state rows per instance: [G phase rows | G freq rows], channels on
    # lanes within each row
    pll_rows = jnp.concatenate([
        pll0[0].reshape(c // LANES, LANES),
        pll0[1].reshape(c // LANES, LANES),
    ], axis=0)  # (2*(c/128), 128) — blocked per G below

    import math as _math
    if nb_avg0 is None:
        nb_avg0 = jnp.zeros((c,), jnp.float32)
    if nb_mask0 is None:
        nb_mask0 = jnp.ones((c, 128), jnp.float32)
    kernel = functools.partial(
        _sam_wide_kernel, groups=G, chunk_nb=chunk_nb, n_chunks=n_chunks,
        out_gain=float(out_gain), agc_release=float(agc_release),
        agc_target=float(agc_target), agc_max_gain=float(agc_max_gain),
        agc_enabled=bool(agc_enabled), dc_pole=float(dc_pole),
        pll_kp=kp, pll_ki=ki, pll_max_freq=max_freq,
        in_gain=float(in_gain), iq_balance=float(iq_balance),
        nb=bool(nb), nb_thresh=float(10.0 ** (nb_thresh_db / 20.0)),
        nb_a=float(_math.exp(-1.0 / nb_tau)),
        # static PLL unroll only in compiled mode: interpret-mode tracing of
        # a fully unrolled serial stream is intractable (the fori form is
        # numerically identical op-for-op)
        precision=precision, static_pll=not interpret)

    cb = G * LANES

    def cspec(rows):
        return pl.BlockSpec((rows, 128), lambda ci: (ci, 0),
                            memory_space=pltpu.VMEM)

    col = pl.BlockSpec((cb, 1), lambda ci: (ci, 0), memory_space=pltpu.VMEM)
    # pll rows: instance ci gets phase rows [ci*G, (ci+1)*G) and freq rows
    # [nG + ci*G, ...), regrouped contiguous per instance on a LEADING
    # instance axis — a flat (n_inst*2G, 128) layout with a (2G, 128) block
    # fails Mosaic lowering when 2G < 8 (sublane divisibility; chip-hit at
    # G=2 x 4 instances, round 5), while a (1, 2G, 128) block is legal for
    # any G because its last two dims equal the array's
    n_inst = c // cb
    idx = np.concatenate([
        np.concatenate([np.arange(i * G, (i + 1) * G),
                        c // LANES + np.arange(i * G, (i + 1) * G)])
        for i in range(n_inst)
    ])
    pll_in = pll_rows[idx].reshape(n_inst, 2 * G, 128)
    pll_spec = pl.BlockSpec((1, 2 * G, 128), lambda ci: (ci, 0, 0),
                            memory_space=pltpu.VMEM)

    ident = jnp.eye(128, dtype=jnp.float32)
    buf = pltpu.VMEM((2, cb, chunk_nb, 128), jnp.float32)
    buf1 = pltpu.VMEM((1, cb, chunk_nb, 128), jnp.float32)
    sem = pltpu.SemaphoreType.DMA((2,))
    sem1 = pltpu.SemaphoreType.DMA((1,))
    cvec = pltpu.VMEM((cb, 128), jnp.float32)
    zbuf = pltpu.VMEM((chunk_t, G, 128), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(n_inst,),
        in_specs=[
            col, col,
            cspec(cb), cspec(cb), cspec(cb), col,
            col, col, pll_spec,
            col, cspec(cb),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((512, 256), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            cspec(cb), cspec(cb), cspec(cb), cspec(cb), pll_spec,
            cspec(cb), cspec(cb),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_inst, 2 * G, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            buf, buf, buf1, buf1, sem, sem, sem1, sem1,
            cvec, cvec, cvec, cvec, cvec, cvec,
            zbuf, zbuf,
            pltpu.VMEM((2 * G, 128), jnp.float32),
            cvec, cvec,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(inc[:, None], phase0[:, None], tail_r, tail_i, audio_tail,
      jnp.asarray(env0, jnp.float32)[:, None],
      jnp.asarray(dc0, jnp.float32)[:, 0:1],
      jnp.asarray(dc0, jnp.float32)[:, 1:2],
      pll_in,
      jnp.asarray(nb_avg0, jnp.float32)[:, None],
      jnp.asarray(nb_mask0, jnp.float32),
      x3r, x3i, w_sb, w_pbt, ident)
    (audio_l, audio_r, atail, env_out, dcx_out, dcy_out, pll_out,
     nbavg_out, nbmask_out) = outs

    # (n_inst, 2G, 128): per-instance [phase G rows | freq G rows]
    phase_out = pll_out[:, 0:G].reshape(c)
    freq_out = pll_out[:, G:2 * G].reshape(c)

    dc_next = jnp.stack([dcx_out[:, 0], dcy_out[:, 0]], axis=-1)
    base = (audio_l.reshape(c, n), audio_r.reshape(c, n), atail,
            env_out[:, 0], dc_next, jnp.stack([phase_out, freq_out], axis=0))
    if nb:
        return base + (nbavg_out[:, 0], nbmask_out)
    return base
