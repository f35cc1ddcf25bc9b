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



import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radiodsp_sdr_rx_tpu.ops import agc as agc_ops
from radiodsp_sdr_rx_tpu.ops import demod as demod_ops
from radiodsp_sdr_rx_tpu.ops import fastconv, nco



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
    x: jax.Array, w: jax.Array, first_tail: jax.Array, axis_name: str
):
    """Overlap-save filtering of a time-sharded stream (inside shard_map).

    x: (n_local,) local contiguous segment; w: collapsed operator;
    first_tail: (F/2,) stream-start carry. Returns (y_local, global_new_tail)
    where global_new_tail is only valid on the last device (it is the stream's
    true final tail; callers normally read it after an all_gather or ignore it).
    """
    half = first_tail.shape[-1]
    my_tail = x[..., -half:]
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
):
    """Build a jitted, time-sharded full RX chain (NCO -> sideband filter ->
    SSB or AM demod -> AGC -> PBT filter), exact vs the single-device chain.

    Returns fn(iq, nco_inc, w_sb, w_audio, agc_release, agc_target,
               agc_max_gain, output_gain) -> audio, with iq sharded over
    ``axis_name`` and everything else replicated.
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
                                    axis_name)

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
                                     axis_name)
        return za.real * out_gain

    sharded = jax.shard_map(
        local_chain,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(axis_name),
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
