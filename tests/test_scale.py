"""Reduced-scale rehearsal of BASELINE config 5: a 1024-channel receiver bank
sharded over the (virtual) 8-device mesh, plus 2-D channel x time sharding."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.models.config import AGCMode, DemodMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.receiver import ReceiverBank, build_params
from radiodsp_sdr_rx_tpu.ops import nco
from radiodsp_sdr_rx_tpu.parallel import (
    make_bank_time_sharded_chain, make_mesh, shard_channel_bank,
)
from radiodsp_sdr_rx_tpu.utils import siggen

# interpret-mode Pallas parity: minutes per test on CPU — full tier only
pytestmark = pytest.mark.slow

FS = 44117.64706


def test_1024_channel_bank_sharded():
    """1024 channels, 8-way channel-sharded; the channel tuned to the test
    signal hears it, far channels do not, bank shapes are right."""
    n = 4096
    n_ch = 1024
    center = 7_050_000.0
    freqs = [center - 20_000.0 + 40.0 * k for k in range(n_ch)]
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.OFF)
    bank = ReceiverBank(cfg, freqs)
    mesh = make_mesh(channel=8, time=1)
    process = shard_channel_bank(bank, mesh)

    # signal at +10 kHz => channel index (10000+20000)/40 = 750
    iq = siggen.am_signal(n, 10_000.0, mod_hz=900.0, fs=FS)
    iq_b = np.broadcast_to(iq, (n_ch, n)).copy()
    out, state = process(iq_b, bank.init_state())
    audio = np.asarray(out["audio_l"])
    assert audio.shape == (n_ch, n)
    assert np.isfinite(audio).all()

    tuned = 750
    powers = (audio[:, 1024:] ** 2).mean(axis=1)
    # tuned channel at the top of the in-band plateau (off-tuned neighbours
    # legitimately hear an offset tone through the AM passband); channels far
    # outside the passband are quiet
    assert powers[tuned] > 0.9 * powers.max()
    assert powers[tuned] > 1e6 * powers[100]


def test_bank_time_2d_sharding_matches_bank():
    """channel x time 2-D mesh == unsharded bank (USB chain)."""
    c, n = 4, 8 * 4096
    center = 7_050_000.0
    freqs = [center + 4_000.0 * k for k in range(c)]
    # the sharded chains model the post-preprocessor pipeline, so disable the
    # IQ gain balance for exact equality with the full bank chain
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.OFF,
                         iq_gain_balance=1.0)
    params = build_params(cfg)
    incs = np.stack([nco.freq_to_phase_inc(f - center, FS) for f in freqs])

    rng = np.random.default_rng(0)
    iq = ((rng.standard_normal((c, n)) + 1j * rng.standard_normal((c, n)))
          .astype(np.complex64) * 0.2)

    mesh = make_mesh(channel=2, time=4)
    chain = make_bank_time_sharded_chain(mesh, sample_rate=FS)
    audio = chain(jnp.asarray(iq), jnp.asarray(incs), params.w_sideband,
                  params.w_audio, params.agc_release, params.agc_target,
                  params.agc_max_gain, params.agc_enabled, params.output_gain)

    bank = ReceiverBank(cfg, freqs)
    out, _ = bank.process(iq, bank.init_state())
    # AGC off -> the chain is linear and the sharded result is tight; with AGC
    # on, envelope log/exp f32 jitter near the max-gain cap widens the diff
    # (covered loosely by test_parallel's full-chain checks)
    np.testing.assert_allclose(np.asarray(audio), np.asarray(out["audio_l"]),
                               atol=2e-4)


def test_sharded_fused_bank_matches_unsharded():
    """make-it-one-call ergonomics (VERDICT r2 #9): ShardedFusedBank over the
    8-device mesh == the single-kernel fused bank, for the NR (lms) and SAM
    chains. 256 channels, 32 per device."""
    from radiodsp_sdr_rx_tpu.models.config import NRMode
    from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank, FusedSAMBank
    from radiodsp_sdr_rx_tpu.parallel.fused_shard import ShardedFusedBank

    rng = np.random.default_rng(21)
    n, n_ch = 4096, 256
    center = 7_050_000.0
    freqs = [center - 16_000.0 + 125.0 * k for k in range(n_ch)]
    mesh = make_mesh(channel=8, time=1)
    xr = rng.standard_normal((n_ch, n)).astype(np.float32) * 0.2
    xi = rng.standard_normal((n_ch, n)).astype(np.float32) * 0.2

    for cfg, oracle_cls in [
        (ReceiverConfig(mode=DemodMode.USB, vfo_freq=freqs[0],
                        capture_center_freq=center, agc=AGCMode.MEDIUM,
                        nr=NRMode.DNR2), FusedNRBank),
        (ReceiverConfig(mode=DemodMode.SAM, vfo_freq=freqs[0],
                        capture_center_freq=center, agc=AGCMode.MEDIUM),
         FusedSAMBank),
    ]:
        sharded = ShardedFusedBank(cfg, freqs, mesh)
        assert isinstance(sharded.template, oracle_cls)
        st = sharded.init_state()
        out1, st = sharded.process_planar(xr, xi, st)
        out2, _ = sharded.process_planar(xr, xi, st)
        got = np.concatenate([np.asarray(out1["audio_l"]),
                              np.asarray(out2["audio_l"])], axis=1)

        oracle = oracle_cls(cfg, freqs)     # fold path lifts the 128 ceiling
        ost = oracle.init_state()
        o1, ost = oracle.process_planar(xr, xi, ost)
        o2, _ = oracle.process_planar(xr, xi, ost)
        want = np.concatenate([np.asarray(o1["audio_l"]),
                               np.asarray(o2["audio_l"])], axis=1)
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_sharded_fused_bank_am_dnr(rng):
    """ShardedFusedBank auto-picks a fused class for EVERY reference-legal
    config (round 4): AM + DNR2 channel-shards the folded lanes kernel."""
    import jax
    from jax.sharding import Mesh

    from radiodsp_sdr_rx_tpu.models.config import (
        AGCMode, DemodMode, NRMode, ReceiverConfig)
    from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank
    from radiodsp_sdr_rx_tpu.parallel.fused_shard import ShardedFusedBank
    from radiodsp_sdr_rx_tpu.parallel.mesh import make_mesh

    n, n_ch = 1024, 16
    center = 7_050_000.0
    freqs = [center + 1_000.0 * k for k in range(n_ch)]
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM,
                         nr=NRMode.DNR2)
    mesh = make_mesh(channel=2)
    sharded = ShardedFusedBank(cfg, freqs, mesh, interpret=True,
                               fold_chunk=512)
    assert isinstance(sharded.template, FusedNRBank)
    xr = rng.standard_normal((n_ch, n)).astype(np.float32) * 0.1
    xi = rng.standard_normal((n_ch, n)).astype(np.float32) * 0.1
    out, st = sharded.process_planar(xr, xi, sharded.init_state())

    one = FusedNRBank(cfg, freqs, interpret=True, fold_chunk=512)
    want, _ = one.process_planar(xr, xi, one.init_state())
    np.testing.assert_allclose(np.asarray(out["audio_l"]),
                               np.asarray(want["audio_l"]), atol=2e-4)
