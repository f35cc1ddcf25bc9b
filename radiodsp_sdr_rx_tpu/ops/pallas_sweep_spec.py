"""Single-sweep SSB chain WITH the spectral-subtraction NR stage folded in.

Round-2 finding (docs/PERFORMANCE.md): the staged spectral path — sweep kernel
emitting stereo to HBM, then planar DFT matmuls in XLA — ran at ~0.9 Gs/s,
bound by the extra HBM round-trips and the standalone DFT stages. The spectral
stage is frame-parallel (only the noise-floor tracker is frame-serial, and it
is a one-pole row recurrence), so it folds straight into the single-sweep
streaming skeleton of ops/pallas_sweep.py with no layout change:

  NCO mix -> overlap-save band-pass + SSB demod (one MXU matmul) -> AGC
  (decaying-max doubling scan) -> PBT audio filter -> spectral subtraction:
      [fl|fr] @ W_fwd -> [sr|si]          (one 512x512 MXU matmul)
      mag, VAD-band floor estimate        (RDSP_convolutional_spec.h:194-202)
      noise floor: one-pole across frames (:114,205-206) as _iir_rows scan
      scale = where(mag<=nf, 0.2, 1-nf/mag)   (:210-218)
      [sr*scale|si*scale] @ W_inv -> right-half [yl|yr]  (one 512x256 matmul)

HBM traffic stays 8 B read + 8 B write per sample — identical to the plain
sweep chain; the spectral stage adds only MXU flops (~6k MACs/sample).

Parity: matches models/fused.FusedNRBank(kind="spectral") staged semantics
(ops/planar.spectral_subtract_planar) to f32 tolerance; state carries
(framing tails, AGC env, noise floor, spectral frame tails) stream
chunk-to-chunk in VMEM and segment-to-segment through the operands.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiodsp_sdr_rx_tpu.ops.mxu import mxu_dot
from radiodsp_sdr_rx_tpu.ops.pallas_sweep import (
    _PHASE_SCALE, _env_lanes, _env_rows, _even_chunks, _iir_rows,
)
from radiodsp_sdr_rx_tpu.ops.spectral_sub import (
    FLOOR_BETA, UNDER_FLOOR_GAIN, VAD_END_BIN, VAD_START_BIN,
)


def _spec_chain_kernel(
    inc_ref, phase0_ref, tin_r_ref, tin_i_ref, atail_in_ref, env0_ref,
    nfl0_ref, stl_in_ref, str_in_ref,
    xr_hbm, xi_hbm, w_ref, wpbt_ref, wsf_ref, wsi_ref,
    l_hbm, r_hbm, atail_out_ref, env_out_ref, nfl_out_ref, stl_out_ref,
    str_out_ref,
    buf_r, buf_i, buf_l, buf_ro, sem_r, sem_i, sem_l, sem_ro,
    tail_r, tail_i, audio_tail, env_carry, nfl_carry, st_l, st_r,
    *, chunk_nb: int, n_chunks: int, out_gain: float,
    agc_release: float, agc_target: float, agc_max_gain: float,
    agc_enabled: bool, nr_gain: float,
    in_gain: float = 1.0, iq_balance: float = 1.0,
    precision=None,
):
    """SSB chain + spectral subtraction for one channel block (streaming
    2-slot VMEM ring — structure mirrors pallas_sweep._chain_kernel).

    nr_gain: the static per-frame floor multiplier nr_level * 1.5 / 150
    (mean over the VAD band x level strength, RDSP_convolutional_spec.h:202).
    """
    cb = buf_r.shape[1]
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

    inc = inc_ref[:][:, :, None]
    ph0 = phase0_ref[:][:, :, None]

    g_i = np.float32(in_gain)
    g_q = np.float32(in_gain * iq_balance)
    scaled = not (in_gain == 1.0 and iq_balance == 1.0)

    # mix the raw input tails (positions -128..-1) into the carried mixed tail
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (cb, 1, 128), 2)
    ang_t = ((ph0 + (lane_t - 128) * inc).astype(jnp.float32) * _PHASE_SCALE)
    ct, st = jnp.cos(ang_t), jnp.sin(ang_t)
    tr_in = tin_r_ref[:][:, None, :]
    ti_in = tin_i_ref[:][:, None, :]
    if scaled:
        tr_in = tr_in * g_i
        ti_in = ti_in * g_q
    tail_r[:] = (tr_in * ct + ti_in * st)[:, 0, :]
    tail_i[:] = (ti_in * ct - tr_in * st)[:, 0, :]
    audio_tail[:] = atail_in_ref[:]
    env_carry[:] = jnp.broadcast_to(env0_ref[:], (cb, 128))
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
    # VAD band mask over the 256 spectrum bins (lanes): 30..180 inclusive
    bin_idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
    vad_mask = jnp.logical_and(bin_idx >= VAD_START_BIN,
                               bin_idx <= VAD_END_BIN).astype(jnp.float32)
    a_floor = np.float32(1.0 - FLOOR_BETA)

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
        phase = ph0 + (t * (chunk_nb * 128) + j_local) * inc
        ang = phase.astype(jnp.float32) * _PHASE_SCALE
        c, s = jnp.cos(ang), jnp.sin(ang)
        xr = buf_r[slot]
        xi = buf_i[slot]
        if scaled:
            xr = xr * g_i
            xi = xi * g_q
        br = xr * c + xi * s
        bi = xi * c - xr * s

        # ---- overlap-save band-pass + fused SSB demod (one matmul) ----
        prev_r = jnp.concatenate([tail_r[:][:, None, :], br[:, :-1, :]], axis=1)
        prev_i = jnp.concatenate([tail_i[:][:, None, :], bi[:, :-1, :]], axis=1)
        frames = jnp.concatenate([prev_r, br, prev_i, bi], axis=-1)
        audio = mxu_dot(
            frames.reshape(cb * chunk_nb, 512), w_ref[:], precision,
            ).reshape(cb, chunk_nb, 128)
        tail_r[:] = br[:, chunk_nb - 1, :]
        tail_i[:] = bi[:, chunk_nb - 1, :]

        # ---- AGC ----
        run_e = _env_lanes(jnp.abs(audio), agc_release)
        seq_e = jnp.concatenate(
            [env_carry[:][:, 0:1], run_e[:, :-1, 127]], axis=1)
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

        # ---- PBT audio filter ([L|R], gain applied after the NR stage) ----
        prev_a = jnp.concatenate(
            [audio_tail[:][:, None, :], audio_g[:, :-1, :]], axis=1)
        frames2 = jnp.concatenate([prev_a, audio_g], axis=-1)
        lr = mxu_dot(
            frames2.reshape(cb * chunk_nb, 256), wpbt_ref[:], precision,
            ).reshape(cb, chunk_nb, 256)
        audio_tail[:] = audio_g[:, chunk_nb - 1, :]
        l = lr[..., :128]
        r = lr[..., 128:]

        # ---- spectral subtraction (backup engine) ----
        # frames: [prev_block | block] of L and R (z = L + jR layout)
        prev_l = jnp.concatenate([st_l[:][:, None, :], l[:, :-1, :]], axis=1)
        prev_rr = jnp.concatenate([st_r[:][:, None, :], r[:, :-1, :]], axis=1)
        ff = jnp.concatenate([prev_l, l, prev_rr, r], axis=-1)  # (cb, nb, 512)
        spec = mxu_dot(
            ff.reshape(cb * chunk_nb, 512), wsf_ref[:], precision,
            ).reshape(cb, chunk_nb, 512)
        st_l[:] = l[:, chunk_nb - 1, :]
        st_r[:] = r[:, chunk_nb - 1, :]
        sr = spec[..., :256]
        si = spec[..., 256:]
        mag = jnp.sqrt(sr * sr + si * si)

        # per-frame VAD floor estimate (mask-multiply keeps lanes regular)
        floor_est = jnp.sum(mag * vad_mask, axis=-1) * np.float32(nr_gain)
        # one-pole floor across frames: nf[j] = (1-b)*nf[j-1] + b*est[j];
        # the carry folds into column 0 via a mask-add (lane-offset concat
        # of (cb,1)+(cb,nb-1) is unsupported by this backend's layout pass)
        bv = np.float32(FLOOR_BETA) * floor_est                # (cb, nb)
        col0 = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk_nb), 1)
                == 0).astype(jnp.float32)
        bv = bv + (a_floor * nfl_carry[:][:, 0:1]) * col0
        nfloor = _iir_rows(bv, float(a_floor))
        nfl_carry[:] = jnp.broadcast_to(
            nfloor[:, chunk_nb - 1:chunk_nb], (cb, 128))
        nf = jnp.maximum(nfloor, 0.0)[:, :, None]

        scale = jnp.where(mag <= nf, np.float32(UNDER_FLOOR_GAIN),
                          1.0 - nf / jnp.maximum(mag, np.float32(1e-20)))
        s2 = jnp.concatenate([sr * scale, si * scale], axis=-1)
        ylr = mxu_dot(
            s2.reshape(cb * chunk_nb, 512), wsi_ref[:], precision,
            ).reshape(cb, chunk_nb, 256)

        buf_l[slot] = ylr[..., :128] * out_gain
        dl = pltpu.make_async_copy(
            buf_l.at[slot],
            l_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
            sem_l.at[slot])
        dl.start()
        buf_ro[slot] = ylr[..., 128:] * out_gain
        dr = pltpu.make_async_copy(
            buf_ro.at[slot],
            r_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
            sem_ro.at[slot])
        dr.start()
        dr.wait()
        dl.wait()

    def body(u, _):
        process(2 * u, 0)
        process(2 * u + 1, 1)
        return 0

    jax.lax.fori_loop(0, n_chunks // 2, body, 0)
    if n_chunks % 2:
        process(n_chunks - 1, 0)
    atail_out_ref[:] = audio_tail[:]
    env_out_ref[:] = env_carry[:]
    nfl_out_ref[:] = nfl_carry[:]
    stl_out_ref[:] = st_l[:]
    str_out_ref[:] = st_r[:]


def sweep_spec_chain(
    xr: jax.Array,
    xi: jax.Array,
    inc: jax.Array,
    phase0: jax.Array,
    w_ssb: jax.Array,
    w_pbt: jax.Array,
    w_spec_fwd: jax.Array,
    w_spec_inv: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
    audio_tail: jax.Array,
    env0: jax.Array,
    nfloor0: jax.Array,
    spec_tail_l: jax.Array,
    spec_tail_r: jax.Array,
    nr_level: float,
    agc_release: float,
    agc_target: float,
    agc_max_gain: float,
    agc_enabled: bool = True,
    out_gain: float = 1.0,
    block_c: int = 8,
    chunk_t: int = 4096,
    interpret: bool = False,
    in_gain: float = 1.0,
    iq_balance: float = 1.0,
    precision=None,
):
    """Whole SSB + spectral-subtraction receive chain in ONE Pallas kernel.

    Args as ops/pallas_sweep.sweep_full_chain, plus:
      w_spec_fwd: (512, 512) spectral_sub.spectral_matmul_ops forward DFT
      w_spec_inv: (512, 256) right-half inverse operator
      nfloor0:     (C,) noise-floor carry (zeros at stream start)
      spec_tail_l/r: (C, 128) previous post-PBT block (spectral frame carry)
      nr_level:    STATIC subtraction strength (reference levels 20/30/40/50,
                   RDSP_controls.h:265-294)

    Returns (audio_l, audio_r, audio_tail', env', nfloor', spec_tail_l',
    spec_tail_r').
    """
    if not (0.0 < agc_release <= 1.0):
        raise ValueError(f"agc_release must be in (0, 1], got {agc_release}")
    inc = jax.lax.bitcast_convert_type(jnp.asarray(inc, jnp.uint32), jnp.int32)
    phase0 = jax.lax.bitcast_convert_type(jnp.asarray(phase0, jnp.uint32),
                                          jnp.int32)
    c, n = xr.shape
    chunk_t = _even_chunks(n, chunk_t)
    chunk_nb = chunk_t // 128
    n_chunks = n // chunk_t
    x3r = xr.reshape(c, n // 128, 128)
    x3i = xi.reshape(c, n // 128, 128)
    # mean over the VAD band divides by (end-start): 150 for 151 bins — the
    # reference's own off-by-one, replicated (RDSP_convolutional_spec.h:200)
    nr_gain = float(nr_level) * 1.5 / float(VAD_END_BIN - VAD_START_BIN)
    kernel = functools.partial(
        _spec_chain_kernel, chunk_nb=chunk_nb, n_chunks=n_chunks,
        out_gain=float(out_gain), agc_release=float(agc_release),
        agc_target=float(agc_target), agc_max_gain=float(agc_max_gain),
        agc_enabled=bool(agc_enabled), nr_gain=nr_gain,
        in_gain=float(in_gain), iq_balance=float(iq_balance),
        precision=precision)

    def vspec(shape):
        return pl.BlockSpec(shape, lambda ci: (ci,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    buf = pltpu.VMEM((2, block_c, chunk_nb, 128), jnp.float32)
    sem = pltpu.SemaphoreType.DMA((2,))
    cvec = pltpu.VMEM((block_c, 128), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(c // block_c,),
        in_specs=[
            vspec((block_c, 1)), vspec((block_c, 1)),
            vspec((block_c, 128)), vspec((block_c, 128)),
            vspec((block_c, 128)), vspec((block_c, 1)),
            vspec((block_c, 1)),
            vspec((block_c, 128)), vspec((block_c, 128)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((512, 128), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 512), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 256), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vspec((block_c, 128)),
            vspec((block_c, 128)),
            vspec((block_c, 128)),
            vspec((block_c, 128)),
            vspec((block_c, 128)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            buf, buf, buf, buf, sem, sem, sem, sem,
            cvec, cvec, cvec, cvec, cvec, cvec, cvec,
        ],
        interpret=interpret,
    )(inc[:, None], phase0[:, None], tail_r, tail_i, audio_tail,
      jnp.asarray(env0, jnp.float32)[:, None],
      jnp.asarray(nfloor0, jnp.float32)[:, None],
      spec_tail_l, spec_tail_r,
      x3r, x3i, w_ssb, w_pbt, w_spec_fwd, w_spec_inv)
    (audio_l, audio_r, atail, env_out, nfl_out, stl_out, str_out) = outs
    return (audio_l.reshape(c, n), audio_r.reshape(c, n), atail,
            env_out[:, 0], nfl_out[:, 0], stl_out, str_out)
