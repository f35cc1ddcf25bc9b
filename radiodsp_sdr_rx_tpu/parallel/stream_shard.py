"""Sharded streaming: time-axis (sequence-parallel) + channel-axis execution.

The reference's only "long-sequence" state is the overlap-save carry — each
256-pt FFT reuses the previous 128 samples (ref: RDSP_convolutional.h:256-285)
— plus per-sample recurrences (AGC envelope, DC blocker). That maps exactly to
ring/context parallelism over the time axis (SURVEY.md §5):

- the 128-sample overlap tail becomes a **halo exchanged between ring
  neighbors with ``jax.lax.ppermute`` over ICI**;
- first-order recurrences (AGC envelope in log-max algebra, DC blocker in
  affine algebra) get an exact cross-device fix-up: each device solves its
  segment with a neutral initial state, per-segment boundary summaries are
  ``all_gather``-ed (ndev scalars), and every device composes its true initial
  state locally — a two-level parallel scan whose outer level rides ICI.

The result: sharded output is bit-identical (to f32 tolerance) to the
single-device stream for the whole linear+AGC receiver chain (USB/LSB/CW/AM).
Sequential adaptive stages (LMS, SAM PLL) shard over *channels* instead.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiodsp_sdr_rx_tpu.ops import agc as agc_ops
from radiodsp_sdr_rx_tpu.ops import demod as demod_ops
from radiodsp_sdr_rx_tpu.ops import fastconv, nco
from radiodsp_sdr_rx_tpu.ops import lms as lms_ops



def _shift_from_left(tail: jax.Array, axis_name: str, first_tail: jax.Array) -> jax.Array:
    """Ring halo: every device receives its LEFT neighbor's tail; the first
    device receives ``first_tail`` (the stream-start carry). ppermute drops
    unmatched destinations to zeros, which we overwrite for device 0."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i + 1) for i in range(n - 1)]
    received = jax.lax.ppermute(tail, axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, first_tail, received)


def sharded_overlap_save(
    x: jax.Array, w: jax.Array, first_tail: jax.Array, axis_name: str,
    halo: str = "ppermute",
):
    """Overlap-save filtering of a time-sharded stream (inside shard_map).

    x: (n_local,) local contiguous segment; w: collapsed operator;
    first_tail: (F/2,) stream-start carry. halo: "ppermute" (XLA collective)
    or "pallas" (fused Pallas make_async_remote_copy ring — SURVEY §2.3's
    named ICI primitive). Returns (y_local, global_new_tail) where
    global_new_tail is only valid on the last device (it is the stream's
    true final tail; callers normally read it after an all_gather or ignore it).
    """
    half = first_tail.shape[-1]
    my_tail = x[..., -half:]
    if halo == "pallas":
        from radiodsp_sdr_rx_tpu.parallel.pallas_halo import shift_from_left_pallas
        tail = shift_from_left_pallas(my_tail, axis_name, first_tail)
    else:
        tail = _shift_from_left(my_tail, axis_name, first_tail)
    y, _ = fastconv.overlap_save_filter(x, w, tail)
    return y, my_tail


def sharded_first_order_iir(
    x: jax.Array, a, b, y0, axis_name: str
) -> jax.Array:
    """Exact time-sharded y[n] = a*y[n-1] + b*x[n].

    Each device solves locally with zero init; the boundary state is an affine
    map y_out = a^n_local * y_in + B_s, so true inits come from a prefix
    composition of the gathered per-segment (decay, B) pairs.
    """
    from radiodsp_sdr_rx_tpu.ops.iir import first_order_iir

    n_local = x.shape[-1]
    y_local, b_s = first_order_iir(x, a, b, jnp.zeros_like(x[..., 0]))
    decay = jnp.asarray(a, x.dtype) ** n_local

    all_b = jax.lax.all_gather(b_s, axis_name)          # (ndev, ...)
    ndev = all_b.shape[0]
    idx = jax.lax.axis_index(axis_name)

    # init for segment s: y0 * a^(s*n_local) + sum_{p<s} B_p * a^((s-1-p)*n_local)
    seg = jnp.arange(ndev)
    powers = jnp.where(idx - 1 - seg >= 0, decay ** (idx - 1 - seg).astype(x.dtype), 0.0)
    mask = (seg < idx).astype(x.dtype)
    init = jnp.tensordot(powers * mask, all_b, axes=(0, 0)) + y0 * decay ** idx.astype(x.dtype)

    k = jnp.arange(n_local, dtype=x.dtype)
    correction = init[..., None] * jnp.asarray(a, x.dtype) ** (k + 1.0)
    return y_local + correction


def sharded_agc_envelope(
    mag: jax.Array, env0, release, axis_name: str
) -> jax.Array:
    """Exact time-sharded env[n] = max(mag[n], env[n-1]*release) via the same
    two-level scheme in (max, +log-decay) algebra."""
    n_local = mag.shape[-1]
    d = -jnp.log(jnp.asarray(release, jnp.float32))
    floor = jnp.exp(agc_ops._LOG_FLOOR)

    env_local, last_local = agc_ops.agc_envelope(mag, jnp.full_like(mag[..., 0], floor),
                                                 release)
    ll = jnp.log(jnp.maximum(last_local, floor))
    all_ll = jax.lax.all_gather(ll, axis_name)          # (ndev, ...)
    ndev = all_ll.shape[0]
    idx = jax.lax.axis_index(axis_name)

    seg = jnp.arange(ndev)
    bshape = (ndev,) + (1,) * (all_ll.ndim - 1)  # broadcast along the gather axis
    gap = ((idx - 1 - seg).astype(jnp.float32) * (n_local * d)).reshape(bshape)
    cand = jnp.where((seg < idx).reshape(bshape), all_ll - gap, agc_ops._LOG_FLOOR)
    l0 = jnp.log(jnp.maximum(jnp.asarray(env0, jnp.float32), floor))
    linit = jnp.maximum(jnp.max(cand, axis=0), l0 - idx.astype(jnp.float32) * n_local * d)

    k = jnp.arange(n_local, dtype=jnp.float32)
    carried = jnp.exp(linit[..., None] - (k + 1.0) * d)
    return jnp.maximum(env_local, carried)


def make_time_sharded_ssb_chain(
    mesh: Mesh,
    *,
    axis_name: str = "time",
    am: bool = False,
    sample_rate: float = 44117.64706,
    halo: str = "ppermute",
):
    """Build a jitted, time-sharded full RX chain (NCO -> sideband filter ->
    SSB or AM demod -> AGC -> PBT filter), exact vs the single-device chain.

    halo: "ppermute" or "pallas" (fused make_async_remote_copy ring,
    parallel/pallas_halo.py). Returns fn(iq, nco_inc, w_sb, w_audio,
    agc_release, agc_target, agc_max_gain, output_gain) -> audio, with iq
    sharded over ``axis_name`` and everything else replicated.
    """

    def local_chain(iq, nco_inc, w_sb, w_audio, rel, tgt, mg, out_gain):
        n_local = iq.shape[-1]
        idx = jax.lax.axis_index(axis_name)
        half = w_sb.shape[1] // 2

        # NCO: exact global phase from the segment offset (uint32 wrap)
        phase0 = jnp.uint32(idx.astype(jnp.uint32) * jnp.uint32(n_local) * nco_inc)
        z, _ = nco.nco_mix(iq, phase0, nco_inc)

        # sideband filter with ring halo — NOTE the halo must be the *mixed*
        # stream's tail, so exchange after mixing
        z, _ = sharded_overlap_save(z, w_sb, jnp.zeros(half, jnp.complex64),
                                    axis_name, halo=halo)

        if am:
            env = jnp.abs(z)
            # DC blocker: x[n]-x[n-1] + pole*y[n-1]; boundary x via 1-halo
            prev = _shift_from_left(env[..., -1:], axis_name, jnp.zeros(1, jnp.float32))
            x_prev = jnp.concatenate([prev, env[..., :-1]], axis=-1)
            audio = sharded_first_order_iir(env - x_prev, 0.995, 1.0,
                                            jnp.float32(0.0), axis_name)
        else:
            audio = demod_ops.demod_ssb(z)

        # AGC with exact cross-device envelope
        envl = sharded_agc_envelope(jnp.abs(audio), 1e-6, rel, axis_name)
        gain = jnp.minimum(tgt / jnp.maximum(envl, 1e-12), mg)
        audio = audio * gain

        # PBT audio filter (reference conv-engine layout: z = L + jR, L = R)
        za = jax.lax.complex(audio, audio)
        za, _ = sharded_overlap_save(za, w_audio, jnp.zeros(half, jnp.complex64),
                                     axis_name, halo=halo)
        return za.real * out_gain

    sharded = jax.shard_map(
        local_chain,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(axis_name),
        # the pallas halo kernel's output vma is inexpressible (see
        # parallel/pallas_halo.ring_shift_right_pallas)
        check_vma=(halo != "pallas"),
    )
    return jax.jit(sharded)


def make_bank_time_sharded_chain(
    mesh: Mesh,
    *,
    channel_axis: str = "channel",
    time_axis: str = "time",
    am: bool = False,
    sample_rate: float = 44117.64706,
):
    """2-D sharded receiver bank: channels over one mesh axis (DP analog),
    time segments over the other (SP analog, ring halos on ICI).

    Returns fn(iq (C, T), nco_inc (C,), w_sb, w_audio, agc_release, agc_target,
               agc_max_gain, agc_enabled, output_gain) -> audio (C, T), with iq sharded
    P(channel, time). This is the framework's full multi-chip step: the two
    parallelism axes the reference's workload actually has. (TP/PP/EP have no
    analog here — there are no large weight matrices to shard; the collapsed
    filter operators are small replicated constants.)
    """

    def local_chain_1d(iq, inc, w_sb, w_audio, rel, tgt, mg, agc_on, out_gain):
        n_local = iq.shape[-1]
        idx = jax.lax.axis_index(time_axis)
        half = w_sb.shape[1] // 2
        phase0 = jnp.uint32(idx.astype(jnp.uint32) * jnp.uint32(n_local) * inc)
        z, _ = nco.nco_mix(iq, phase0, inc)
        z, _ = sharded_overlap_save(z, w_sb, jnp.zeros(half, jnp.complex64),
                                    time_axis)
        if am:
            env = jnp.abs(z)
            prev = _shift_from_left(env[..., -1:], time_axis,
                                    jnp.zeros(1, jnp.float32))
            x_prev = jnp.concatenate([prev, env[..., :-1]], axis=-1)
            audio = sharded_first_order_iir(env - x_prev, 0.995, 1.0,
                                            jnp.float32(0.0), time_axis)
        else:
            audio = demod_ops.demod_ssb(z)
        envl = sharded_agc_envelope(jnp.abs(audio), 1e-6, rel, time_axis)
        gain = jnp.where(agc_on,
                         jnp.minimum(tgt / jnp.maximum(envl, 1e-12), mg), 1.0)
        audio = audio * gain
        za = jax.lax.complex(audio, audio)
        za, _ = sharded_overlap_save(za, w_audio, jnp.zeros(half, jnp.complex64),
                                     time_axis)
        return za.real * out_gain

    def local_block(iq, inc, w_sb, w_audio, rel, tgt, mg, agc_on, out_gain):
        # vmap local channels; time-axis collectives stay mesh collectives
        return jax.vmap(
            local_chain_1d,
            in_axes=(0, 0, None, None, None, None, None, None, None),
        )(iq, inc, w_sb, w_audio, rel, tgt, mg, agc_on, out_gain)

    sharded = jax.shard_map(
        local_block,
        mesh=mesh,
        in_specs=(P(channel_axis, time_axis), P(channel_axis),
                  P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(channel_axis, time_axis),
    )
    return jax.jit(sharded)


class ShardedChainState(NamedTuple):
    """Mid-stream entry/exit state for the full sharded chain (VERDICT r1 #6):
    the same carries as models/receiver.ReceiverState, in the sharded chain's
    complex layout. All leaves are per-channel (C on axis 0)."""

    nco_phase: jax.Array    # (C,) uint32 DDS phase at segment start
    sb_tail: jax.Array      # (C, half) complex64 MIXED-stream overlap carry
    audio_tail: jax.Array   # (C, half) complex64 PBT-stage overlap carry
    agc_env: jax.Array      # (C,) f32
    am_dc: jax.Array        # (C, 2) f32 DC-blocker carry [last in, last out]
    sam_phase: jax.Array    # (C,) f32
    sam_freq: jax.Array     # (C,) f32
    lms: lms_ops.LMSState   # (C, ...) leaves
    nfloor: jax.Array       # (C,) f32 spectral noise-floor carry
    spec_tail_l: jax.Array  # (C, half) f32 spectral frame carries (post-PBT L)
    spec_tail_r: jax.Array  # (C, half) f32
    nb_avg: jax.Array       # (C,) f32 noise-blanker running-average carry


def sharded_chain_init(n_channels: int, half: int = 128) -> ShardedChainState:
    from radiodsp_sdr_rx_tpu.ops import lms as lms_mod

    c = n_channels
    one = lms_ops.lms_nr_init()
    return ShardedChainState(
        nco_phase=np.zeros(c, np.uint32),
        sb_tail=np.zeros((c, half), np.complex64),
        audio_tail=np.zeros((c, half), np.complex64),
        agc_env=np.full(c, 1e-6, np.float32),
        am_dc=np.zeros((c, 2), np.float32),
        sam_phase=np.zeros(c, np.float32),
        sam_freq=np.zeros(c, np.float32),
        lms=jax.tree.map(
            lambda leaf: np.broadcast_to(
                np.asarray(leaf), (c,) + np.shape(leaf)).copy(), one),
        nfloor=np.zeros(c, np.float32),
        spec_tail_l=np.zeros((c, half), np.float32),
        spec_tail_r=np.zeros((c, half), np.float32),
        nb_avg=np.zeros(c, np.float32),
    )


def _to_adaptive_layout(x: jax.Array, time_axis: str) -> jax.Array:
    """Reshard (C_loc, T_loc) -> (C_loc/tdim, T_global) with one all_to_all
    over the time mesh axis (Ulysses-style): sequential adaptive stages (LMS,
    SAM PLL) need each channel's FULL time axis on one device, so the time
    axis is traded for a finer channel split. Rides ICI."""
    tdim = jax.lax.axis_size(time_axis)
    c_loc = x.shape[0]
    if c_loc % tdim:
        raise ValueError(f"local channels {c_loc} not divisible by time "
                         f"mesh dim {tdim}")
    return jax.lax.all_to_all(x, time_axis, split_axis=0, concat_axis=1,
                              tiled=True)


def _from_adaptive_layout(y: jax.Array, time_axis: str) -> jax.Array:
    """Inverse of _to_adaptive_layout."""
    return jax.lax.all_to_all(y, time_axis, split_axis=1, concat_axis=0,
                              tiled=True)


def _last_shard_value(val: jax.Array, axis_name: str) -> jax.Array:
    """Replicate the LAST time shard's value to every device (for state-out
    leaves: the stream's true final carry lives on the last segment)."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    return jax.lax.psum(
        jnp.where(idx == n - 1, val, jnp.zeros_like(val)), axis_name)


def make_full_sharded_chain(
    mesh: Mesh,
    *,
    mode: str = "usb",
    nr: str = "off",
    channel_axis: str = "channel",
    time_axis: str = "time",
    sample_rate: float = 44117.64706,
    lms_mu: float = 0.0316,
    nr_level: float = 30.0,
    noise_blanker: bool = False,
    nb_threshold_db: float = 10.0,
    nb_tau: float = 512.0,
):
    """The COMPLETE 2-D sharded receiver chain: channels over one mesh axis,
    time over the other, including the adaptive stages the 1-D chains skip
    (VERDICT r1 #5). One shard_map composes:

      - linear stages (NCO, overlap-save filters, AGC envelope, DC blocker)
        time-sharded with ppermute halos / all_gather fix-ups as in
        make_bank_time_sharded_chain;
      - adaptive stages (SAM PLL, LMS notch/denoise) via an all_to_all
        resegment (_to_adaptive_layout): the time axis is exchanged for a
        finer channel split so each device scans full-length streams for its
        sub-bank of channels, then the inverse all_to_all restores the 2-D
        layout. Both collectives ride ICI.

    mode: "usb" | "am" | "sam"; nr: "off" | "lms" | "notch" | "spectral"
    (``nr_level`` is the spectral subtraction strength; the noise-floor
    one-pole across frames gets the same exact cross-device fix-up as the
    IIR/AGC seams — VERDICT r3 #4, RDSP_convolutional_spec.h:114,205-206).
    Requires (C / channel_dim) % time_dim == 0 for adaptive stages.

    Returns fn(iq (C, T), incs (C,), state0: ShardedChainState, w_sb, w_audio,
               agc_release, agc_target, agc_max_gain, agc_enabled, out_gain)
            -> (audio (C, T), state1: ShardedChainState)
    matching the unsharded per-channel chain (models/receiver.rx_chain with
    input_gain=1, balance=1, mute=False) to f32 tolerance, INCLUDING entry
    from a mid-stream state (state0) and exit state for resume (state1).
    """
    from radiodsp_sdr_rx_tpu.ops import planar

    if mode not in ("usb", "am", "sam"):
        raise ValueError(mode)
    if nr not in ("off", "lms", "notch", "spectral"):
        raise ValueError(nr)
    from radiodsp_sdr_rx_tpu.ops.spectral_sub import (
        FLOOR_BETA, UNDER_FLOOR_GAIN, VAD_END_BIN, VAD_START_BIN,
        spectral_matmul_ops,
    )
    w_spec_fwd, w_spec_inv = spectral_matmul_ops(256)
    spec_gain = float(nr_level) * 1.5 / float(VAD_END_BIN - VAD_START_BIN)

    nb_a = float(math.exp(-1.0 / nb_tau))
    nb_th = float(10.0 ** (nb_threshold_db / 20.0))

    def local_chain_1d(iq, inc, sb_tail0, atail0, env0, phase_base, dc0,
                       nbavg0, w_sb, w_audio, rel, tgt, mg, agc_on, out_gain):
        """One channel's time shard (time collectives only)."""
        n_local = iq.shape[-1]
        idx = jax.lax.axis_index(time_axis)
        half = w_sb.shape[1] // 2
        phase0 = (phase_base
                  + idx.astype(jnp.uint32) * jnp.uint32(n_local) * inc)
        nbavg1 = nbavg0
        if noise_blanker:
            # pre-mix noise blanker: the running-average one-pole is an
            # affine recurrence across the whole stream — the SAME exact
            # cross-device fix-up as the DC blocker / spectral floor seams
            mag = jnp.abs(iq)
            avg = sharded_first_order_iir(mag, nb_a, 1.0 - nb_a, nbavg0,
                                          time_axis)
            keep = mag <= avg * jnp.float32(nb_th) + 1e-12
            iq = jnp.where(keep, iq, jnp.zeros_like(iq))
            nbavg1 = _last_shard_value(avg[..., -1], time_axis)
        z, _ = nco.nco_mix(iq, phase0, inc)
        z, my_tail = sharded_overlap_save(z, w_sb, sb_tail0, time_axis)
        sb_tail1 = _last_shard_value(my_tail, time_axis)

        if mode == "am":
            env = jnp.abs(z)
            prev = _shift_from_left(env[..., -1:], time_axis,
                                    dc0[0:1])
            x_prev = jnp.concatenate([prev, env[..., :-1]], axis=-1)
            audio = sharded_first_order_iir(env - x_prev, 0.995, 1.0,
                                            dc0[1], time_axis)
            dc1 = _last_shard_value(
                jnp.stack([env[..., -1], audio[..., -1]]), time_axis)
        else:
            audio = demod_ops.demod_ssb(z) if mode == "usb" else z
            dc1 = dc0
        return audio, sb_tail1, dc1, nbavg1

    def agc_pbt_1d(audio, atail0, env0, w_audio, rel, tgt, mg, agc_on,
                   out_gain):
        envl = sharded_agc_envelope(jnp.abs(audio), env0, rel, time_axis)
        gain = jnp.where(agc_on,
                         jnp.minimum(tgt / jnp.maximum(envl, 1e-12), mg), 1.0)
        audio = audio * gain
        env1 = _last_shard_value(envl[..., -1], time_axis)
        za = jax.lax.complex(audio, audio)
        za, my_tail = sharded_overlap_save(za, w_audio, atail0, time_axis)
        atail1 = _last_shard_value(my_tail, time_axis)
        return za.real * out_gain, za.imag * out_gain, atail1, env1

    def local_block(iq, inc, state0: ShardedChainState, w_sb, w_audio,
                    rel, tgt, mg, agc_on, out_gain):
        n_local = iq.shape[-1]
        tdim = jax.lax.axis_size(time_axis)
        n_total = n_local * tdim

        # ---- linear front (vmapped channels; time collectives inside) ----
        audio, sb_tail1, dc1, nbavg1 = jax.vmap(
            local_chain_1d,
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None, None, None,
                     None, None),
        )(iq, inc, state0.sb_tail, state0.audio_tail, state0.agc_env,
          state0.nco_phase, state0.am_dc, state0.nb_avg, w_sb, w_audio,
          rel, tgt, mg, agc_on, out_gain)

        sam_phase1, sam_freq1 = state0.sam_phase, state0.sam_freq
        lms1 = state0.lms

        # ---- adaptive-stage helpers: all_to_all to (C_sub, T_global) ----
        tdim_static = mesh.shape[time_axis]
        c_loc = audio.shape[0]

        def take_sub(leaf):
            # channel slice of this device's adaptive sub-bank: the time-axis
            # coordinate picks which C_loc/tdim channels this device scans
            tidx = jax.lax.axis_index(time_axis)
            sub = c_loc // tdim_static
            return jax.lax.dynamic_slice_in_dim(leaf, tidx * sub, sub, 0)

        def put_sub(full_shape_leaf, sub_val):
            # scatter the sub-bank results back (psum of one-hot placement)
            tidx = jax.lax.axis_index(time_axis)
            sub = c_loc // tdim_static
            buf = jnp.zeros_like(full_shape_leaf)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, sub_val.astype(full_shape_leaf.dtype), tidx * sub, 0)
            return jax.lax.psum(buf, time_axis)

        if mode == "sam" or nr in ("lms", "notch"):
            if mode == "sam":
                a2 = _to_adaptive_layout(audio, time_axis)   # complex z!
                zr, zi = a2.real, a2.imag
                p0, f0 = take_sub(state0.sam_phase), take_sub(state0.sam_freq)
                d0 = take_sub(state0.am_dc)

                def one(zr1, zi1, p, f, d):
                    st = planar.SAMStatePlanar(phase=p, freq=f, dc=d)
                    out, st2 = planar.demod_sam_planar(
                        zr1, zi1, st, sample_rate=sample_rate)
                    return out, st2.phase, st2.freq, st2.dc

                out, p1, f1, d1 = jax.vmap(one)(zr, zi, p0, f0, d0)
                audio = _from_adaptive_layout(out, time_axis)
                sam_phase1 = put_sub(state0.sam_phase, p1)
                sam_freq1 = put_sub(state0.sam_freq, f1)
                dc1 = put_sub(state0.am_dc, d1)

            if nr == "notch":
                a2 = _to_adaptive_layout(audio, time_axis)
                lms_sub = jax.tree.map(take_sub, state0.lms)

                def one_n(x1, st):
                    return lms_ops.lms_nr_run(x1, st, lms_mu, mode="notch")

                out, lms_sub1 = jax.vmap(one_n)(a2, lms_sub)
                audio = _from_adaptive_layout(out, time_axis)
                lms1 = jax.tree.map(put_sub, state0.lms, lms_sub1)

        # ---- AGC + PBT (time-sharded linear back end) ----
        audio, audio_r, atail1, env1 = jax.vmap(
            agc_pbt_1d,
            in_axes=(0, 0, 0, None, None, None, None, None, None),
        )(audio, state0.audio_tail, state0.agc_env, w_audio, rel, tgt, mg,
          agc_on, out_gain)

        # ---- post-PBT spectral subtraction (frame-parallel; only the
        # noise-floor one-pole is frame-serial -> sharded affine fix-up) ----
        nfloor1 = state0.nfloor
        stl1, str1 = state0.spec_tail_l, state0.spec_tail_r
        if nr == "spectral":
            def spectral_1d(l, r, nfl0, stl0, str0):
                nb_loc = l.shape[-1] // 128
                prev_l = _shift_from_left(l[..., -128:], time_axis, stl0)
                prev_r = _shift_from_left(r[..., -128:], time_axis, str0)
                fl = l.reshape(nb_loc, 128)
                fr = r.reshape(nb_loc, 128)
                pl_rows = jnp.concatenate([prev_l[None, :], fl[:-1]], axis=0)
                pr_rows = jnp.concatenate([prev_r[None, :], fr[:-1]], axis=0)
                ff = jnp.concatenate([pl_rows, fl, pr_rows, fr], axis=-1)
                spec = jnp.matmul(ff, w_spec_fwd,
                                  precision=jax.lax.Precision.HIGHEST)
                sr, si = spec[:, :256], spec[:, 256:]
                mag = jnp.sqrt(sr * sr + si * si)
                est = jnp.sum(
                    mag[:, VAD_START_BIN:VAD_END_BIN + 1], axis=-1
                ) * jnp.float32(spec_gain)
                nfl = sharded_first_order_iir(
                    est, 1.0 - FLOOR_BETA, FLOOR_BETA, nfl0, time_axis)
                nfl = jnp.maximum(nfl, 0.0)
                nf = nfl[:, None]
                scale = jnp.where(mag <= nf, jnp.float32(UNDER_FLOOR_GAIN),
                                  1.0 - nf / jnp.maximum(mag, 1e-20))
                s2 = jnp.concatenate([sr * scale, si * scale], axis=-1)
                y = jnp.matmul(s2, w_spec_inv,
                               precision=jax.lax.Precision.HIGHEST)
                nfl1 = _last_shard_value(nfl[-1], time_axis)
                stl_next = _last_shard_value(l[..., -128:], time_axis)
                str_next = _last_shard_value(r[..., -128:], time_axis)
                return (y[:, :128].reshape(l.shape),
                        y[:, 128:].reshape(r.shape),
                        nfl1, stl_next, str_next)

            audio, audio_r, nfloor1, stl1, str1 = jax.vmap(
                spectral_1d,
            )(audio, audio_r, state0.nfloor, state0.spec_tail_l,
              state0.spec_tail_r)

        # ---- post-PBT denoise (adaptive) ----
        if nr == "lms":
            a2 = _to_adaptive_layout(audio, time_axis)
            lms_sub = jax.tree.map(take_sub, state0.lms)

            def one_d(x1, st):
                return lms_ops.lms_nr_run(x1, st, lms_mu, mode="denoise")

            out, lms_sub1 = jax.vmap(one_d)(a2, lms_sub)
            audio = _from_adaptive_layout(out, time_axis) * 1.1
            lms1 = jax.tree.map(put_sub, state0.lms, lms_sub1)

        state1 = ShardedChainState(
            nco_phase=state0.nco_phase
            + jnp.uint32(n_total) * inc.astype(jnp.uint32),
            sb_tail=sb_tail1, audio_tail=atail1, agc_env=env1, am_dc=dc1,
            sam_phase=sam_phase1, sam_freq=sam_freq1, lms=lms1,
            nfloor=nfloor1, spec_tail_l=stl1, spec_tail_r=str1,
            nb_avg=nbavg1,
        )
        return audio, state1

    state_specs = ShardedChainState(
        nco_phase=P(channel_axis), sb_tail=P(channel_axis),
        audio_tail=P(channel_axis), agc_env=P(channel_axis),
        am_dc=P(channel_axis), sam_phase=P(channel_axis),
        sam_freq=P(channel_axis),
        lms=lms_ops.LMSState(weights=P(channel_axis), window=P(channel_axis),
                             delay=P(channel_axis), first=P()),
        nfloor=P(channel_axis), spec_tail_l=P(channel_axis),
        spec_tail_r=P(channel_axis), nb_avg=P(channel_axis),
    )
    sharded = jax.shard_map(
        local_block,
        mesh=mesh,
        in_specs=(P(channel_axis, time_axis), P(channel_axis), state_specs,
                  P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(channel_axis, time_axis), state_specs),
    )
    return jax.jit(sharded)


def sharded_panadapter(
    mesh: Mesh,
    *,
    axis_name: str = "time",
    naverage: int = 30,
):
    """Distributed spectrum aggregation (SURVEY.md §2.3): each device computes
    panadapter frames over its local time segment; the magnitude-squared
    averages reduce across the mesh with ``psum`` so every device holds the
    full-capture averaged spectrum — the collective analog of the analyzer's
    ``naverage`` accumulation (analyze_fft256iq.cpp:86-99).

    Returns fn(iq (n,) complex sharded over time) -> (n_dev_updates, 256)
    display-order rows, where each row averages naverage*ndev frames (the
    per-device updates are psum-averaged element-wise across devices).
    """
    from radiodsp_sdr_rx_tpu.ops import analyzers

    def local(iq):
        half_tail = _shift_from_left(iq[..., -128:], axis_name,
                                     jnp.zeros(128, iq.dtype))
        rows = analyzers.iq_spectrum_frames(iq, naverage=naverage,
                                            tail=half_tail)
        n_dev = jax.lax.axis_size(axis_name)
        # G. Heinzel averaging is over magnitude *squared*; rows are
        # sqrt(mean magsq)*32768, so reduce the squares for exactness
        return jnp.sqrt(jax.lax.psum(rows * rows, axis_name) / n_dev)

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=P(axis_name), out_specs=P(),
    )
    return jax.jit(sharded)


def shard_channel_bank(bank, mesh: Mesh, axis_name: str = "channel"):
    """Wrap a models.receiver.ReceiverBank so channels shard over a mesh axis.

    Per-channel leaves (nco_inc, all state) get NamedSharding on axis 0; the
    shared filter matrices replicate. XLA then runs each channel shard's
    pipeline locally; bank-wide reductions (S-meter aggregation) become
    ICI collectives.
    """
    chan = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    params = jax.tree.map(
        lambda leaf: jax.device_put(leaf, repl), bank.params
    )._replace(nco_inc=jax.device_put(bank.params.nco_inc, chan))

    def process(iq, state):
        import numpy as _np

        if isinstance(iq, _np.ndarray) and _np.iscomplexobj(iq):
            xr, xi = (_np.ascontiguousarray(iq.real, _np.float32),
                      _np.ascontiguousarray(iq.imag, _np.float32))
        elif jnp.iscomplexobj(iq):
            xr, xi = iq.real.astype(jnp.float32), iq.imag.astype(jnp.float32)
        else:
            xr, xi = iq, jnp.zeros_like(iq)
        xr = jax.device_put(xr, chan)
        xi = jax.device_put(xi, chan)
        state = jax.tree.map(lambda leaf: jax.device_put(leaf, chan), state)
        return bank._fn(params, state, xr, xi)

    return process
