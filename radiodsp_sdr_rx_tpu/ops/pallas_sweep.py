"""Single-sweep fused kernels: manual double-buffered DMA, VMEM tail carry.

The stateless kernels in ops/pallas_kernels.py pay an extra 8 B/sample to read
a one-block-shifted view of the stream (this backend rejects cross-grid-step
scratch carries). These kernels instead put the WHOLE time axis inside one
grid step per channel-block and stream it chunk-by-chunk with explicit
``pltpu.make_async_copy`` double buffering — the framing tail lives in VMEM
scratch across the in-kernel ``fori_loop`` (a pattern this backend does
support). HBM traffic for mix+filter+demod drops to 8 B read + 4 B write per
sample — the design recorded as headroom #1 in docs/PERFORMANCE.md.

Grid: (C/block_c,). Inputs stay in HBM (``pl.ANY``); per-chunk slices are
DMA'd into a 2-slot VMEM ring overlapping compute with the next chunk's load.

One streaming skeleton (`_chain_kernel`) serves every full-chain mode; the
demod stage in the middle is selected statically:

  - ``demod="ssb"``: sideband filter + SSB demod collapse into one half-width
    matmul (RDSP_convolutional.h:291-309 + phasing demod in one operator).
  - ``demod="am"``: full complex band-pass matmul, then envelope
    sqrt(I^2+Q^2) and a DC blocker y[n] = env[n]-env[n-1] + pole*y[n-1]
    (ops/iir.dc_blocker semantics) computed as a decaying-SUM doubling scan.

Both then share the AGC (decaying-max doubling scan), PBT matmul and output
DMA blocks — the reference runs every mode through this same engine
(RDSP_convolutional.h:228-353).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiodsp_sdr_rx_tpu.ops.mxu import mxu_dot

_PHASE_SCALE = np.float32(2.0 * np.pi / 4294967296.0)


def _even_chunks(n: int, chunk_t: int) -> int:
    """Largest chunk_t' <= chunk_t (a multiple of 128) with n % chunk_t' == 0.

    The kernel loop body is unrolled 2 chunks/iter for static DMA slot
    indices; an odd chunk count is handled by one statically-emitted trailing
    ``process`` call, so the only real constraint is n % 128 == 0."""
    chunk_t = min(chunk_t, n)
    while chunk_t >= 128 and n % chunk_t:
        chunk_t //= 2
    if chunk_t < 128:
        raise ValueError(f"n={n} must be a multiple of 128 (one reference "
                         "audio block, RDSP_convolutional.h:34)")
    return chunk_t


def _sweep_kernel(
    inc_ref, phase0_ref, xr_hbm, xi_hbm, w_ref, out_hbm,
    buf_r, buf_i, buf_o, sem_r, sem_i, sem_o, tail_r, tail_i,
    *, chunk_nb: int, n_chunks: int, out_gain: float,
):
    """One channel-block: stream the full time axis in chunks of
    ``chunk_nb`` 128-sample blocks. Buffers (2, cb, chunk_nb, 128).

    HBM refs are the WHOLE arrays (this backend requires trivial index maps
    for ``pl.ANY``); the channel-block slice happens inside the DMA."""
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

    tail_r[:] = jnp.zeros_like(tail_r)
    tail_i[:] = jnp.zeros_like(tail_i)
    d0r, d0i = dma_in(0, 0)
    d0r.start()
    d0i.start()

    inc = inc_ref[:][:, :, None]              # (cb, 1, 1) int32
    ph0 = phase0_ref[:][:, :, None]
    blk = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk_nb, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk_nb, 128), 2)
    j_local = blk * 128 + lane

    # slot indices must be STATIC (this backend has no dynamic_slice on VMEM
    # vectors), so the loop body is unrolled two chunks per iteration.
    def process(t, slot: int):
        @pl.when(t + 1 < n_chunks)
        def _():
            nr, ni = dma_in(1 - slot, t + 1)
            nr.start()
            ni.start()

        cr, ci = dma_in(slot, t)
        cr.wait()
        ci.wait()

        # mix with absolute-position DDS phases (int32 wrap == uint32 DDS)
        phase = ph0 + (t * (chunk_nb * 128) + j_local) * inc
        ang = phase.astype(jnp.float32) * _PHASE_SCALE
        c, s = jnp.cos(ang), jnp.sin(ang)
        xr = buf_r[slot]
        xi = buf_i[slot]
        br = xr * c + xi * s
        bi = xi * c - xr * s

        prev_r = jnp.concatenate([tail_r[:][:, None, :], br[:, :-1, :]], axis=1)
        prev_i = jnp.concatenate([tail_i[:][:, None, :], bi[:, :-1, :]], axis=1)
        frames = jnp.concatenate([prev_r, br, prev_i, bi], axis=-1)
        y = jax.lax.dot_general(
            frames.reshape(cb * chunk_nb, 512), w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(cb, chunk_nb, 128)

        tail_r[:] = br[:, chunk_nb - 1, :]
        tail_i[:] = bi[:, chunk_nb - 1, :]

        buf_o[slot] = y * out_gain
        d_out = pltpu.make_async_copy(
            buf_o.at[slot],
            out_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
            sem_o.at[slot])
        d_out.start()
        d_out.wait()

    def body(u, _):
        process(2 * u, 0)
        process(2 * u + 1, 1)
        return 0

    jax.lax.fori_loop(0, n_chunks // 2, body, 0)
    if n_chunks % 2:
        # odd chunk count: the last pair's prefetch already targeted slot 0
        process(n_chunks - 1, 0)


def sweep_mix_filter_demod(
    xr: jax.Array,
    xi: jax.Array,
    inc: jax.Array,
    phase0: jax.Array,
    w: jax.Array,
    out_gain: float = 1.0,
    block_c: int = 8,
    chunk_t: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Single-sweep fused NCO mix + sideband filter + SSB demod.

    xr, xi: (C, n) f32; inc, phase0: (C,) uint32; w: (512, 128)
    (pallas_kernels.ssb_demod_operator). Stream starts with zero tails (use
    the stateless kernels for mid-stream segments, or pre-pend the carry).
    Returns audio (C, n) f32.
    """
    inc = jax.lax.bitcast_convert_type(jnp.asarray(inc, jnp.uint32), jnp.int32)
    phase0 = jax.lax.bitcast_convert_type(jnp.asarray(phase0, jnp.uint32), jnp.int32)
    c, n = xr.shape
    chunk_t = _even_chunks(n, chunk_t)
    chunk_nb = chunk_t // 128
    n_chunks = n // chunk_t
    x3r = xr.reshape(c, n // 128, 128)
    x3i = xi.reshape(c, n // 128, 128)
    kernel = functools.partial(_sweep_kernel, chunk_nb=chunk_nb,
                               n_chunks=n_chunks, out_gain=out_gain)
    audio = pl.pallas_call(
        kernel,
        grid=(c // block_c,),
        in_specs=[
            pl.BlockSpec((block_c, 1), lambda ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1), lambda ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((512, 128), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block_c, chunk_nb, 128), jnp.float32),
            pltpu.VMEM((2, block_c, chunk_nb, 128), jnp.float32),
            pltpu.VMEM((2, block_c, chunk_nb, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
        ],
        interpret=interpret,
    )(inc[:, None], phase0[:, None], x3r, x3i, w)
    return audio.reshape(c, n)


# ---------------------------------------------------------------------------
# Full-chain sweep: mix + filter + demod (SSB or AM) + AGC + PBT in ONE kernel
# ---------------------------------------------------------------------------

def _env_lanes(mag: jax.Array, release: float) -> jax.Array:
    """Within-row decaying running max along the lane axis:
    x[t] = max_{k<=t} mag[k] * release^(t-k), via 7 doubling max-shifts with
    STATIC scalar decay factors (linear domain — no logs/exps)."""
    cb, nb = mag.shape[0], mag.shape[1]
    x = mag
    for sh in (1, 2, 4, 8, 16, 32, 64):
        f = np.float32(release ** sh)
        pad = jnp.zeros((cb, nb, sh), x.dtype)
        x = jnp.maximum(x, jnp.concatenate([pad, x[..., :-sh]], axis=-1) * f)
    return x


def _env_rows(seq: jax.Array, release128: float) -> jax.Array:
    """Inclusive decaying-max scan along axis 1 of (cb, nb), factor
    release^128 per step (Hillis-Steele doubling)."""
    cb, nb = seq.shape
    sh = 1
    while sh < nb:
        f = np.float32(release128 ** sh)
        pad = jnp.zeros((cb, sh), seq.dtype)
        seq = jnp.maximum(seq,
                          jnp.concatenate([pad, seq[:, :-sh]], axis=1) * f)
        sh *= 2
    return seq


def _iir_lanes(x: jax.Array, pole: float) -> jax.Array:
    """Within-row first-order IIR along the lane axis:
    y[t] = sum_{k<=t} x[k] * pole^(t-k) — the `+` twin of _env_lanes (Hillis-
    Steele doubling with STATIC scalar decay factors)."""
    cb, nb = x.shape[0], x.shape[1]
    for sh in (1, 2, 4, 8, 16, 32, 64):
        f = np.float32(pole ** sh)
        pad = jnp.zeros((cb, nb, sh), x.dtype)
        x = x + jnp.concatenate([pad, x[..., :-sh]], axis=-1) * f
    return x


def _iir_rows(seq: jax.Array, pole128: float) -> jax.Array:
    """Inclusive decaying-sum scan along axis 1 of (cb, nb), factor
    pole^128 per step — the `+` twin of _env_rows."""
    cb, nb = seq.shape
    sh = 1
    while sh < nb:
        f = np.float32(pole128 ** sh)
        pad = jnp.zeros((cb, sh), seq.dtype)
        seq = seq + jnp.concatenate([pad, seq[:, :-sh]], axis=1) * f
        sh *= 2
    return seq


def _chain_kernel(
    inc_ref, phase0_ref, tin_r_ref, tin_i_ref, atail_in_ref, env0_ref,
    dcx0_ref, dcy0_ref, nbavg0_ref, nbmask0_ref,
    xr_hbm, xi_hbm, w_ref, wpbt_ref,
    l_hbm, r_hbm, atail_out_ref, env_out_ref, dcx_out_ref, dcy_out_ref,
    nbavg_out_ref, nbmask_out_ref,
    buf_r, buf_i, buf_l, buf_ro, sem_r, sem_i, sem_l, sem_ro,
    tail_r, tail_i, audio_tail, env_carry, dcx, dcy, nbavg, nbmask,
    *, chunk_nb: int, n_chunks: int, out_gain: float,
    agc_release: float, agc_target: float, agc_max_gain: float,
    agc_enabled: bool, emit_r: bool, demod: str, dc_pole: float,
    in_gain: float = 1.0, iq_balance: float = 1.0,
    nb: bool = False, nb_thresh: float = 3.1623, nb_a: float = 0.998047,
    precision=None,
):
    """The whole reference conv-engine chain for one channel block, streaming
    the time axis through a 2-slot VMEM ring. Parity chain (to f32 tol):

      NCO mix -> overlap-save filter [+ SSB demod fused into the matmul when
      demod="ssb"] (RDSP_convolutional.h:291-309 collapsed) ->
      [demod="am": envelope sqrt(I^2+Q^2) -> DC blocker
       y[n] = env[n]-env[n-1] + dc_pole*y[n-1] (ops/iir.dc_blocker)] ->
      AGC (instant-attack / exponential-release, ops/agc.py law) ->
      PBT audio filter (pbt_operator matmul) -> out gain.

    AGC recurrence env[k] = max(|a[k]|, env[k-1]*release) is computed in the
    LINEAR domain as a decaying-max doubling scan: 7 lane shifts with static
    scalar factors release^(2^i), then a row scan with factor release^128 —
    O(log n) depth, no per-sample loop, and (unlike ops/agc.py's log-domain
    XLA form, which needs k*d offsets for associativity) no logs/exps at all.
    The AM DC blocker uses the decaying-SUM twin of the same scan. All carries
    (framing tails, AGC env, DC-blocker x/y) persist in VMEM across chunks and
    are emitted for seamless streaming (models/fused.py state semantics).
    """
    cb = buf_r.shape[1]
    c0 = pl.program_id(0) * cb
    w_out = 256 if demod == "am" else 128

    def dma_in(slot, t):
        return (
            pltpu.make_async_copy(
                xr_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
                buf_r.at[slot], sem_r.at[slot]),
            pltpu.make_async_copy(
                xi_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
                buf_i.at[slot], sem_i.at[slot]),
        )

    inc = inc_ref[:][:, :, None]              # (cb, 1, 1) int32
    ph0 = phase0_ref[:][:, :, None]

    # input gain / IQ balance fold into the kernel (saves two full HBM passes
    # that scaling outside would cost — the chain is bandwidth-bound)
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
    if nb:
        # previous segment's last-block keep mask: blanking is a 0/1 gate
        # that commutes with the scale + mix, so masking the re-mixed tail
        # reproduces the XLA chain's blank-before-framing exactly
        tail_r[:] = (tr_in * ct + ti_in * st)[:, 0, :] * nbmask0_ref[:]
        tail_i[:] = (ti_in * ct - tr_in * st)[:, 0, :] * nbmask0_ref[:]
        nbavg[:] = jnp.broadcast_to(nbavg0_ref[:], (cb, 128))
    else:
        tail_r[:] = (tr_in * ct + ti_in * st)[:, 0, :]
        tail_i[:] = (ti_in * ct - tr_in * st)[:, 0, :]
    audio_tail[:] = atail_in_ref[:]
    env_carry[:] = jnp.broadcast_to(env0_ref[:], (cb, 128))
    if demod == "am":
        dcx[:] = jnp.broadcast_to(dcx0_ref[:], (cb, 128))
        dcy[:] = jnp.broadcast_to(dcy0_ref[:], (cb, 128))

    d0r, d0i = dma_in(0, 0)
    d0r.start()
    d0i.start()

    blk = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk_nb, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk_nb, 128), 2)
    j_local = blk * 128 + lane
    # per-lane decay release^(l+1) for the row-carry contribution (computed
    # once; the only transcendentals in the AGC / DC blocker)
    lane1 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2) + 1
             ).astype(jnp.float32)  # int iota + cast (no f32 iota on TPU)
    r_lane = jnp.exp(np.float32(np.log(agc_release)) * lane1) \
        if agc_release < 1.0 else jnp.ones((1, 1, 128), jnp.float32)
    release128 = float(np.float64(agc_release) ** 128)
    if demod == "am":
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

        # ---- NCO mix (absolute-position DDS phases; int32 wrap == uint32) --
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
            # one-pole running-average magnitude (the decaying-SUM doubling
            # scan, same row-carry pattern as the AM DC blocker), zero any
            # sample whose magnitude exceeds avg * threshold ----
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

        # ---- overlap-save filter (+ fused SSB demod) as one MXU matmul -----
        prev_r = jnp.concatenate([tail_r[:][:, None, :], br[:, :-1, :]], axis=1)
        prev_i = jnp.concatenate([tail_i[:][:, None, :], bi[:, :-1, :]], axis=1)
        frames = jnp.concatenate([prev_r, br, prev_i, bi], axis=-1)
        y = mxu_dot(
            frames.reshape(cb * chunk_nb, 512), w_ref[:], precision,
            ).reshape(cb, chunk_nb, w_out)
        tail_r[:] = br[:, chunk_nb - 1, :]
        tail_i[:] = bi[:, chunk_nb - 1, :]

        if demod == "am":
            # ---- AM envelope + DC blocker (decaying-sum doubling scan) ----
            # Built from the same 2-D slice / lane-concat / (cb,nb)[:,:,None]
            # broadcast patterns the SSB AGC uses — this backend's gather
            # lowering rejects newaxis-on-(cb,1) and int-index+slice chains.
            zr = y[..., :128]
            zi = y[..., 128:]
            env = jnp.sqrt(zr * zr + zi * zi)
            # one-sample-delayed env: lane shift (zeros into lane 0), then
            # add each row's true previous sample (last lane of row j-1,
            # dcx carry for row 0) masked into lane 0
            shifted = jnp.concatenate(
                [jnp.zeros((cb, chunk_nb, 1), env.dtype), env[..., :-1]],
                axis=-1)
            row_prev = jnp.concatenate(
                [dcx[:][:, 0:1], env[:, :-1, 127]], axis=1)   # (cb, nb)
            lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
                     == 0).astype(env.dtype)
            diff = env - (shifted + row_prev[:, :, None] * lane0)
            run = _iir_lanes(diff, dc_pole)                # within-row IIR
            seq = jnp.concatenate(
                [dcy[:][:, 0:1], run[:, :-1, 127]], axis=1)  # (cb, nb)
            carry_in = _iir_rows(seq, pole128)             # y at end of row j-1
            audio = run + carry_in[:, :, None] * p_lane
            dcx[:] = jnp.broadcast_to(
                env[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
            dcy[:] = jnp.broadcast_to(
                audio[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
        else:
            audio = y

        # ---- AGC (linear-domain decaying-max doubling scan) ----
        run_e = _env_lanes(jnp.abs(audio), agc_release)   # within-row env
        # inclusive row scan over [env_carry, row_env_0 .. row_env_{nb-2}]:
        # c[j] = env at the end of row j-1 (i.e. the carry INTO row j)
        seq_e = jnp.concatenate(
            [env_carry[:][:, 0:1], run_e[:, :-1, 127]], axis=1)  # (cb, nb)
        carry_e = _env_rows(seq_e, release128)
        envl = jnp.maximum(run_e, carry_e[:, :, None] * r_lane)
        env_carry[:] = jnp.broadcast_to(                # env at last sample
            envl[:, chunk_nb - 1, :][:, 127:128], (cb, 128))
        if agc_enabled:
            gain = jnp.minimum(
                np.float32(agc_target) / jnp.maximum(envl, np.float32(1e-12)),
                np.float32(agc_max_gain))
            audio_g = audio * gain
        else:
            audio_g = audio

        # ---- PBT audio filter (one matmul, [L|R]) ----
        prev_a = jnp.concatenate(
            [audio_tail[:][:, None, :], audio_g[:, :-1, :]], axis=1)
        frames2 = jnp.concatenate([prev_a, audio_g], axis=-1)
        lr = mxu_dot(
            frames2.reshape(cb * chunk_nb, 256), wpbt_ref[:], precision,
            ).reshape(cb, chunk_nb, 256)
        audio_tail[:] = audio_g[:, chunk_nb - 1, :]

        buf_l[slot] = lr[..., :128] * out_gain
        dl = pltpu.make_async_copy(
            buf_l.at[slot],
            l_hbm.at[pl.ds(c0, cb), pl.ds(t * chunk_nb, chunk_nb)],
            sem_l.at[slot])
        dl.start()
        if emit_r:
            buf_ro[slot] = lr[..., 128:] * out_gain
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
        # odd chunk count: the last pair's prefetch already targeted slot 0
        process(n_chunks - 1, 0)
    atail_out_ref[:] = audio_tail[:]
    env_out_ref[:] = env_carry[:]
    if demod == "am":
        dcx_out_ref[:] = dcx[:]
        dcy_out_ref[:] = dcy[:]
    else:
        dcx_out_ref[:] = jnp.zeros_like(dcx_out_ref)
        dcy_out_ref[:] = jnp.zeros_like(dcy_out_ref)
    nbavg_out_ref[:] = nbavg[:] if nb else jnp.zeros_like(nbavg_out_ref)
    nbmask_out_ref[:] = nbmask[:] if nb else jnp.ones_like(nbmask_out_ref)


def _sweep_chain(
    xr, xi, inc, phase0, w, w_pbt, tail_r, tail_i, audio_tail, env0, dc0,
    *, demod: str, agc_release: float, agc_target: float, agc_max_gain: float,
    agc_enabled: bool, out_gain: float, dc_pole: float,
    block_c: int, chunk_t: int, emit_r: bool, interpret: bool,
    in_gain: float = 1.0, iq_balance: float = 1.0,
    nb: bool = False, nb_thresh_db: float = 10.0, nb_tau: float = 512.0,
    nb_avg0=None, nb_mask0=None, precision=None,
):
    """Shared pallas_call wrapper for the full-chain sweep kernels."""
    if not (0.0 < dc_pole <= 1.0):
        raise ValueError(f"dc_pole must be in (0, 1], got {dc_pole}")
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
    w_in = 512
    w_out = 256 if demod == "am" else 128
    import math as _math
    kernel = functools.partial(
        _chain_kernel, chunk_nb=chunk_nb, n_chunks=n_chunks,
        out_gain=out_gain, agc_release=float(agc_release),
        agc_target=agc_target, agc_max_gain=agc_max_gain,
        agc_enabled=agc_enabled, emit_r=emit_r, demod=demod,
        dc_pole=float(dc_pole), in_gain=float(in_gain),
        iq_balance=float(iq_balance), nb=bool(nb),
        nb_thresh=float(10.0 ** (nb_thresh_db / 20.0)),
        nb_a=float(_math.exp(-1.0 / nb_tau)), precision=precision)
    if nb_avg0 is None:
        nb_avg0 = jnp.zeros((c,), jnp.float32)
    if nb_mask0 is None:
        nb_mask0 = jnp.ones((c, 128), jnp.float32)

    def vspec(shape):
        return pl.BlockSpec(shape, lambda ci: (ci,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    buf = pltpu.VMEM((2, block_c, chunk_nb, 128), jnp.float32)
    # emit_r=False: the kernel never writes R — shrink its HBM output and the
    # VMEM staging buffer to dummies instead of allocating a dead (C, n) plane
    buf_ro = buf if emit_r else pltpu.VMEM((2, 1, 1, 128), jnp.float32)
    r_blocks = n // 128 if emit_r else 1
    sem = pltpu.SemaphoreType.DMA((2,))
    dc0 = jnp.asarray(dc0, jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(c // block_c,),
        in_specs=[
            vspec((block_c, 1)), vspec((block_c, 1)),
            vspec((block_c, 128)), vspec((block_c, 128)),
            vspec((block_c, 128)), vspec((block_c, 1)),
            vspec((block_c, 1)), vspec((block_c, 1)),
            vspec((block_c, 1)), vspec((block_c, 128)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((w_in, w_out), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda ci: (0, 0),
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
            vspec((block_c, 128)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, r_blocks, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
            jax.ShapeDtypeStruct((c, 128), jnp.float32),
        ],
        scratch_shapes=[
            buf, buf, buf, buf_ro, sem, sem, sem, sem,
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
        ],
        interpret=interpret,
    )(inc[:, None], phase0[:, None], tail_r, tail_i, audio_tail,
      jnp.asarray(env0, jnp.float32)[:, None],
      dc0[:, 0:1], dc0[:, 1:2],
      jnp.asarray(nb_avg0, jnp.float32)[:, None],
      jnp.asarray(nb_mask0, jnp.float32),
      x3r, x3i, w, w_pbt)
    (audio_l, audio_r, atail, env_out, dcx_out, dcy_out,
     nbavg_out, nbmask_out) = outs
    env_next = env_out[:, 0]
    dc_next = jnp.stack([dcx_out[:, 0], dcy_out[:, 0]], axis=-1)
    audio_l = audio_l.reshape(c, n)
    audio_r = audio_r.reshape(c, n) if emit_r else None
    return (audio_l, audio_r, atail, env_next, dc_next,
            nbavg_out[:, 0], nbmask_out)


def sweep_full_chain(
    xr: jax.Array,
    xi: jax.Array,
    inc: jax.Array,
    phase0: jax.Array,
    w_ssb: jax.Array,
    w_pbt: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
    audio_tail: jax.Array,
    env0: jax.Array,
    agc_release: float,
    agc_target: float,
    agc_max_gain: float,
    agc_enabled: bool = True,
    out_gain: float = 1.0,
    block_c: int = 8,
    chunk_t: int = 4096,
    emit_r: bool = True,
    interpret: bool = False,
    in_gain: float = 1.0,
    iq_balance: float = 1.0,
    nb: bool = False,
    nb_thresh_db: float = 10.0,
    nb_tau: float = 512.0,
    nb_avg0=None,
    nb_mask0=None,
    precision=None,
):
    """Whole SSB receive chain in one single-sweep Pallas kernel.

    HBM traffic: 8 B read + 8 B write per sample stereo (4 B write mono) — vs
    ~40 B for the three-stage fused path. Args:

      xr, xi:      (C, n) f32 planar IQ (already input-gain/balance scaled)
      inc, phase0: (C,) uint32 DDS words
      w_ssb:       (512, 128) ssb_demod_operator
      w_pbt:       (256, 256) pbt_operator
      tail_r/i:    (C, 128) RAW scaled input last block of previous segment
                   (zeros at stream start) — mixed in-kernel
      audio_tail:  (C, 128) post-AGC audio tail of previous segment
      env0:        (C,) AGC envelope carry
      agc_release: per-sample envelope decay (ops/agc.AGCParams.release)

    Returns (audio_l, audio_r, audio_tail_next, env_next); audio_r is None
    when emit_r=False. State semantics match models/fused.FusedSSBBank.
    With nb=True (AudioSDR noise blanker folded before the mix,
    RadioDSP_SDR_RX.ino:129-131) the return grows (..., nb_avg_next,
    nb_mask_next): the running-average carry and the last block's keep mask
    (applied to the re-mixed framing tail next segment).
    """
    c = xr.shape[0]
    audio_l, audio_r, atail, env_next, _, nbavg, nbmask = _sweep_chain(
        xr, xi, inc, phase0, w_ssb, w_pbt, tail_r, tail_i, audio_tail, env0,
        jnp.zeros((c, 2), jnp.float32),
        demod="ssb", agc_release=agc_release, agc_target=agc_target,
        agc_max_gain=agc_max_gain, agc_enabled=agc_enabled,
        out_gain=out_gain, dc_pole=1.0, block_c=block_c, chunk_t=chunk_t,
        emit_r=emit_r, interpret=interpret, in_gain=in_gain,
        iq_balance=iq_balance, nb=nb, nb_thresh_db=nb_thresh_db,
        nb_tau=nb_tau, nb_avg0=nb_avg0, nb_mask0=nb_mask0,
        precision=precision)
    if nb:
        return audio_l, audio_r, atail, env_next, nbavg, nbmask
    return audio_l, audio_r, atail, env_next


def sweep_am_chain(
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
    agc_release: float,
    agc_target: float,
    agc_max_gain: float,
    agc_enabled: bool = True,
    out_gain: float = 1.0,
    dc_pole: float = 0.995,
    block_c: int = 8,
    chunk_t: int = 4096,
    emit_r: bool = True,
    interpret: bool = False,
    in_gain: float = 1.0,
    iq_balance: float = 1.0,
    nb: bool = False,
    nb_thresh_db: float = 10.0,
    nb_tau: float = 512.0,
    nb_avg0=None,
    nb_mask0=None,
    precision=None,
):
    """Whole AM receive chain in one single-sweep Pallas kernel.

    Same streaming structure as sweep_full_chain but with the AM demod
    (envelope + DC blocker) between the band-pass and the AGC. Args as
    sweep_full_chain, plus:

      w_sb:  (512, 256) fir_design.overlap_save_matrix_real (full complex
             band-pass — AM needs both planes for the envelope)
      dc0:   (C, 2) DC-blocker carry [last envelope input, last output]
             (ops/iir.dc_blocker y0 semantics; zeros at stream start)

    Returns (audio_l, audio_r, audio_tail_next, env_next, dc_next) with
    dc_next (C, 2); audio_r is None when emit_r=False. With nb=True the
    return grows (..., nb_avg_next, nb_mask_next) as in sweep_full_chain.
    """
    out = _sweep_chain(
        xr, xi, inc, phase0, w_sb, w_pbt, tail_r, tail_i, audio_tail, env0,
        dc0,
        demod="am", agc_release=agc_release, agc_target=agc_target,
        agc_max_gain=agc_max_gain, agc_enabled=agc_enabled,
        out_gain=out_gain, dc_pole=dc_pole, block_c=block_c, chunk_t=chunk_t,
        emit_r=emit_r, interpret=interpret, in_gain=in_gain,
        iq_balance=iq_balance, nb=nb, nb_thresh_db=nb_thresh_db,
        nb_tau=nb_tau, nb_avg0=nb_avg0, nb_mask0=nb_mask0,
        precision=precision)
    return out if nb else out[:5]
