"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4):
halo-exchange sharded output == single-device output."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from radiodsp_sdr_rx_tpu.models.config import AGCMode, DemodMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.receiver import Receiver, ReceiverBank, build_params
from radiodsp_sdr_rx_tpu.ops import agc as agc_ops
from radiodsp_sdr_rx_tpu.ops import fastconv, fir_design
from radiodsp_sdr_rx_tpu.ops.iir import first_order_iir
from radiodsp_sdr_rx_tpu.parallel import (
    make_mesh,
    make_time_sharded_ssb_chain,
    shard_channel_bank,
    sharded_agc_envelope,
    sharded_first_order_iir,
    sharded_overlap_save,
)
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_overlap_save_equals_single(rng):
    mesh = make_mesh(channel=1, time=8)
    mask = fir_design.design_filter_mask(300.0, 4000.0, FS)
    w = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    n = 8 * 2048
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)

    y_single, _ = fastconv.overlap_save_filter(
        jnp.asarray(x), w, jnp.zeros(128, jnp.complex64)
    )

    def local(xs, ws):
        y, _ = sharded_overlap_save(xs, ws, jnp.zeros(128, jnp.complex64), "time")
        return y

    f = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=(P(None, "time"), P()),
                              out_specs=P(None, "time")))
    y_sharded = f(jnp.asarray(x)[None, :], w)[0]
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_single), atol=1e-5)


def test_sharded_iir_equals_single(rng):
    mesh = make_mesh(channel=1, time=8)
    n = 8 * 4096
    x = rng.standard_normal(n).astype(np.float32)
    a, b, y0 = 0.999, 0.001, 0.7

    y_single, _ = first_order_iir(jnp.asarray(x), a, b, jnp.float32(y0))

    def local(xs):
        return sharded_first_order_iir(xs, a, b, jnp.float32(y0), "time")

    f = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=P(None, "time"),
                              out_specs=P(None, "time")))
    y_sharded = f(jnp.asarray(x)[None, :])[0]
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_single),
                               rtol=1e-4, atol=1e-5)


def test_sharded_agc_envelope_equals_single(rng):
    mesh = make_mesh(channel=1, time=8)
    n = 8 * 4096
    mag = np.abs(rng.standard_normal(n)).astype(np.float32)
    release = 0.9996
    env0 = 0.4

    env_single, _ = agc_ops.agc_envelope(jnp.asarray(mag), jnp.float32(env0), release)

    def local(ms):
        return sharded_agc_envelope(ms, env0, release, "time")

    f = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=P(None, "time"),
                              out_specs=P(None, "time")))
    env_sharded = f(jnp.asarray(mag)[None, :])[0]
    np.testing.assert_allclose(np.asarray(env_sharded), np.asarray(env_single),
                               rtol=5e-4)


def test_time_sharded_full_chain_equals_single_device():
    """The flagship equality: 8-way time-sharded USB chain == single device."""
    n = 8 * 16384
    audio_in = siggen.voice_like(n, FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)

    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.FAST,
                         iq_gain_balance=1.0)  # sharded chains are post-preprocessor
    params = build_params(cfg)

    # single-device reference chain (same stages, via the Receiver)
    rx = Receiver(cfg)
    out_single, _ = rx.process(jnp.asarray(iq), rx.init_state())

    mesh = make_mesh(channel=1, time=8)
    chain = make_time_sharded_ssb_chain(mesh, sample_rate=FS)
    audio = chain(jnp.asarray(iq), params.nco_inc, params.w_sideband,
                  params.w_audio, params.agc_release, params.agc_target,
                  params.agc_max_gain, params.output_gain)
    # tolerance: the parallel AGC envelope uses log/exp algebra whose f32
    # rounding differs slightly from the sequential chunked path
    np.testing.assert_allclose(np.asarray(audio),
                               np.asarray(out_single["audio_l"]), atol=2e-3)


def test_time_sharded_am_chain_equals_single_device():
    n = 8 * 16384
    iq = siggen.am_signal(n, 10_000.0, mod_hz=900.0, fs=FS)
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.MEDIUM,
                         iq_gain_balance=1.0)  # sharded chains are post-preprocessor
    params = build_params(cfg)
    rx = Receiver(cfg)
    out_single, _ = rx.process(jnp.asarray(iq), rx.init_state())

    mesh = make_mesh(channel=1, time=8)
    chain = make_time_sharded_ssb_chain(mesh, am=True, sample_rate=FS)
    audio = chain(jnp.asarray(iq), params.nco_inc, params.w_sideband,
                  params.w_audio, params.agc_release, params.agc_target,
                  params.agc_max_gain, params.output_gain)
    # tolerance: the parallel AGC envelope uses log/exp algebra whose f32
    # rounding differs slightly from the sequential chunked path
    np.testing.assert_allclose(np.asarray(audio),
                               np.asarray(out_single["audio_l"]), atol=2e-3)


def test_channel_sharded_bank_equals_unsharded():
    n = 1 << 14
    freqs = [7_050_000.0 + 2_000.0 * k for k in range(8)]
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=freqs[0],
                         capture_center_freq=7_050_000.0, agc=AGCMode.OFF)
    bank = ReceiverBank(cfg, freqs)
    iq = jnp.asarray(siggen.am_signal(n, 6_000.0, mod_hz=700.0, fs=FS))
    out_ref, _ = bank.process(iq, bank.init_state())

    mesh = make_mesh(channel=8, time=1)
    process = shard_channel_bank(bank, mesh)
    iq_b = jnp.broadcast_to(iq, (8, n))
    out_sharded, _ = process(iq_b, bank.init_state())
    np.testing.assert_allclose(np.asarray(out_sharded["audio_l"]),
                               np.asarray(out_ref["audio_l"]), atol=1e-5)


def test_bank_metrics_collective():
    """Bank-wide S-meter reduction across a sharded channel axis (psum path)."""
    mesh = make_mesh(channel=8, time=1)

    def local_power(x):
        p = jnp.sum(jnp.abs(x) ** 2, axis=-1, keepdims=True)
        return jax.lax.psum(p, "channel")

    f = jax.jit(jax.shard_map(local_power, mesh=mesh,
                              in_specs=P("channel", None), out_specs=P(None)))
    x = jnp.ones((8, 128), jnp.float32)
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), 8 * 128.0)


def test_sharded_panadapter_matches_global_average():
    """psum-reduced time-sharded panadapter == single-device analyzer run at
    naverage*ndev averaging (exact magsq-domain reduction)."""
    from radiodsp_sdr_rx_tpu.ops import analyzers
    from radiodsp_sdr_rx_tpu.parallel import sharded_panadapter

    n = 8 * 128 * 30  # one 30-frame update per device
    iq = (siggen.carrier(n, 5000.0, FS, amp=0.4)
          + siggen.noise(n, 0.02)).astype(np.complex64)

    mesh = make_mesh(channel=1, time=8)
    fn = sharded_panadapter(mesh, naverage=30)
    rows = np.asarray(fn(jnp.asarray(iq)))
    assert rows.shape == (1, 256)

    want = np.asarray(analyzers.iq_spectrum_frames(
        jnp.asarray(iq), naverage=240,
        tail=jnp.zeros(128, jnp.complex64)))
    np.testing.assert_allclose(rows[0], want[0], rtol=1e-3, atol=0.5)


def _unsharded_full_chain(mode, nr, iq, incs, params, state_c, lms_mu):
    """Per-channel reference chain matching make_full_sharded_chain stages."""
    from radiodsp_sdr_rx_tpu.ops import demod as demod_ops
    from radiodsp_sdr_rx_tpu.ops import lms as lms_ops
    from radiodsp_sdr_rx_tpu.ops import nco as nco_ops
    from radiodsp_sdr_rx_tpu.ops import planar

    def one(iq1, inc1, sb_tail, atail, env0, phase0, dc0, sam_p, sam_f,
            lms_st, nfl0, stl0, str0):
        z, _ = nco_ops.nco_mix(iq1, phase0, inc1)
        z, _ = fastconv.overlap_save_filter(z, params.w_sideband, sb_tail)
        if mode == "usb":
            audio = demod_ops.demod_ssb(z)
        elif mode == "am":
            env = jnp.abs(z)
            from radiodsp_sdr_rx_tpu.ops.iir import dc_blocker
            audio, _ = dc_blocker(env, dc0)
        else:  # sam
            st = __import__("radiodsp_sdr_rx_tpu.ops.planar", fromlist=["x"])
            s0 = planar.SAMStatePlanar(phase=sam_p, freq=sam_f, dc=dc0)
            audio, _ = planar.demod_sam_planar(z.real, z.imag, s0,
                                               sample_rate=FS)
        if nr == "notch":
            audio, lms_st2 = lms_ops.lms_nr_run(audio, lms_st, lms_mu,
                                                mode="notch")
        env, _ = agc_ops.agc_envelope(jnp.abs(audio), env0,
                                      params.agc_release)
        gain = jnp.minimum(params.agc_target / jnp.maximum(env, 1e-12),
                           params.agc_max_gain)
        audio = audio * gain
        za = jax.lax.complex(audio, audio)
        za, _ = fastconv.overlap_save_filter(za, params.w_audio, atail)
        audio = za.real * params.output_gain
        if nr == "spectral":
            audio, _r, _nf, _tl, _tr = planar.spectral_subtract_planar(
                audio, za.imag * params.output_gain, 30.0, nfl0,
                params.dft_cos, params.dft_sin, stl0, str0)
        if nr == "lms":
            audio, _ = lms_ops.lms_nr_run(audio, lms_st, lms_mu,
                                          mode="denoise")
            audio = audio * 1.1
        return audio

    st = state_c
    return jax.vmap(one)(
        iq, jnp.asarray(incs), st.sb_tail, st.audio_tail, st.agc_env,
        st.nco_phase, st.am_dc, st.sam_phase, st.sam_freq, st.lms,
        st.nfloor, st.spec_tail_l, st.spec_tail_r)


def _full_chain_case(mode, nr, rng_seed=7):
    """Shared harness: 4 channels x (4 time shards x 4096), 2x4 mesh."""
    from radiodsp_sdr_rx_tpu.parallel.stream_shard import (
        make_full_sharded_chain, sharded_chain_init)

    np_rng = np.random.default_rng(rng_seed)
    n_chan, tdim, n_loc = 8, 4, 4096
    n = tdim * n_loc
    mesh = make_mesh(channel=2, time=4)
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.FAST,
                         iq_gain_balance=1.0)
    params = build_params(cfg)
    incs = np.asarray(
        [np.uint32(k * 977 + 12345) * np.uint32(65536) for k in range(n_chan)],
        np.uint32)
    iq = jnp.asarray(
        (np_rng.standard_normal((n_chan, n))
         + 1j * np_rng.standard_normal((n_chan, n))).astype(np.complex64) * 0.2)

    lms_mu = 0.0316
    chain = make_full_sharded_chain(mesh, mode=mode, nr=nr, sample_rate=FS,
                                    lms_mu=lms_mu, nr_level=30.0)
    state0 = sharded_chain_init(n_chan)
    audio, state1 = chain(iq, incs, state0, params.w_sideband, params.w_audio,
                          params.agc_release, params.agc_target,
                          params.agc_max_gain, params.agc_enabled,
                          params.output_gain)
    want = _unsharded_full_chain(mode, nr, iq, incs, params, state0, lms_mu)
    np.testing.assert_allclose(np.asarray(audio), np.asarray(want), atol=2e-3)
    return chain, state1, iq, incs, params, mode, nr, lms_mu


def test_full_sharded_chain_usb_dnr_equals_single():
    """VERDICT r1 #5: 2-D mesh chain with the adaptive LMS denoiser =="""
    _full_chain_case("usb", "lms")


def test_full_sharded_chain_sam_equals_single():
    _full_chain_case("sam", "off")


def test_full_sharded_chain_usb_notch_equals_single():
    _full_chain_case("usb", "notch")


def test_full_sharded_chain_spectral_equals_single():
    """VERDICT r3 #4: the spectral-subtraction NR as a full member of the
    time-sharded chain — the noise-floor one-pole across frames gets the
    same exact cross-device affine fix-up as the IIR/AGC seams."""
    _full_chain_case("usb", "spectral")
    _full_chain_case("am", "spectral")


def test_full_sharded_chain_midstream_resume():
    """Mid-stream state entry: two sharded segments == one double-length
    sharded run (state threads exactly through the seam)."""
    from radiodsp_sdr_rx_tpu.parallel.stream_shard import (
        make_full_sharded_chain, sharded_chain_init)

    np_rng = np.random.default_rng(11)
    n_chan, n = 8, 4 * 4096
    mesh = make_mesh(channel=2, time=4)
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.FAST,
                         iq_gain_balance=1.0)
    params = build_params(cfg)
    incs = np.asarray([np.uint32(k * 977 + 11111) * np.uint32(65536)
                       for k in range(n_chan)], np.uint32)
    iq = jnp.asarray(
        (np_rng.standard_normal((n_chan, 2 * n))
         + 1j * np_rng.standard_normal((n_chan, 2 * n)))
        .astype(np.complex64) * 0.2)

    chain = make_full_sharded_chain(mesh, mode="usb", nr="lms", sample_rate=FS)
    args = (params.w_sideband, params.w_audio, params.agc_release,
            params.agc_target, params.agc_max_gain, params.agc_enabled,
            params.output_gain)

    full, _ = chain(iq, incs, sharded_chain_init(n_chan), *args)
    st = sharded_chain_init(n_chan)
    a1, st = chain(iq[:, :n], incs, st, *args)
    a2, _ = chain(iq[:, n:], incs, st, *args)
    got = np.concatenate([np.asarray(a1), np.asarray(a2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(full), atol=2e-3)


def test_pallas_halo_ring_equals_ppermute(rng):
    """Fused Pallas make_async_remote_copy ring (SURVEY §2.3's named ICI
    primitive) == ppermute halo, on the 8-device mesh via the Mosaic
    interpreter (remote DMAs + barrier simulated, race detection ON)."""
    import functools

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from radiodsp_sdr_rx_tpu.parallel.pallas_halo import shift_from_left_pallas
    from radiodsp_sdr_rx_tpu.parallel.stream_shard import _shift_from_left

    mesh = make_mesh(channel=1, time=8)
    n = 8 * 1024
    x = (rng.standard_normal(n)).astype(np.float32)
    first = jnp.full(128, 7.5, jnp.float32)

    def local(fn, xl):
        return fn(xl[..., -128:], "time", first)

    for name, fn in (("pallas", shift_from_left_pallas),
                     ("ppermute", _shift_from_left)):
        got = jax.jit(shard_map(
            functools.partial(local, fn), mesh=mesh,
            in_specs=P(None, "time"), out_specs=P(None, "time"),
            check_vma=False,
        ))(x[None, :])
        if name == "pallas":
            got_pallas = np.asarray(got)
        else:
            got_ppermute = np.asarray(got)
    np.testing.assert_array_equal(got_pallas, got_ppermute)

    # complex tails (the sharded chains' layout) round-trip too
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    firstz = jnp.zeros(128, jnp.complex64)

    def localz(fn, zl):
        return fn(zl[..., -128:], "time", firstz)

    a = jax.jit(shard_map(functools.partial(localz, shift_from_left_pallas),
                          mesh=mesh, in_specs=P(None, "time"),
                          out_specs=P(None, "time"), check_vma=False))(
                              z[None, :])
    b = jax.jit(shard_map(functools.partial(localz, _shift_from_left),
                          mesh=mesh, in_specs=P(None, "time"),
                          out_specs=P(None, "time")))(z[None, :])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_time_sharded_chain_pallas_halo_equals_single_device():
    """Whole time-sharded USB chain with the fused Pallas RDMA halo == the
    single-device Receiver (VERDICT r1 #7)."""
    n = 8 * 8192
    audio_in = siggen.voice_like(n, FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.FAST,
                         iq_gain_balance=1.0)
    params = build_params(cfg)
    rx = Receiver(cfg)
    out_single, _ = rx.process(jnp.asarray(iq), rx.init_state())

    mesh = make_mesh(channel=1, time=8)
    chain = make_time_sharded_ssb_chain(mesh, sample_rate=FS, halo="pallas")
    audio = chain(jnp.asarray(iq), params.nco_inc, params.w_sideband,
                  params.w_audio, params.agc_release, params.agc_target,
                  params.agc_max_gain, params.output_gain)
    np.testing.assert_allclose(np.asarray(audio),
                               np.asarray(out_single["audio_l"]), atol=2e-3)
