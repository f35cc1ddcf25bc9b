"""Metrics pipeline + checkpoint/resume tests."""

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.models.config import AGCMode, DemodMode, NRMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.metrics import analyze, scope_init
from radiodsp_sdr_rx_tpu.models.receiver import Receiver
from radiodsp_sdr_rx_tpu.utils import checkpoint, siggen
from radiodsp_sdr_rx_tpu.utils.display import WATERFALL_COLORS, render_waterfall_ascii

FS = 44117.64706


def test_analyze_produces_all_metrics():
    n = 128 * 31 * 4  # enough frames for 4 updates at naverage=30
    iq = (siggen.carrier(n, 5000.0, FS, amp=0.4)
          + siggen.noise(n, 0.01)).astype(np.complex64)
    audio = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS).astype(np.float32)

    m, state = analyze(jnp.asarray(iq), jnp.asarray(audio), scope_init())
    assert m["spectrum"].shape[1] == 256
    assert m["waterfall"].shape == (50, 128)
    assert m["view"].shape == (256,)
    assert m["audio_spectrum"].shape[1] == 512
    assert np.isfinite(float(m["s_units"]))
    # carrier at +5 kHz must light the correct display column (left of center
    # maps positive freqs with decreasing index; see analyzers test)
    row = np.asarray(m["spectrum"][-1])
    peak = row.argmax()
    assert abs((127 - peak) - 5000.0 / FS * 256) <= 2
    # color classes in range
    cls = np.asarray(m["waterfall_cls"])
    assert cls.min() >= 0 and cls.max() < len(WATERFALL_COLORS)
    # renderer runs on the real waterfall
    art = render_waterfall_ascii(np.asarray(m["waterfall"]))
    assert len(art.splitlines()) == 50


def test_analyze_streaming_continuity():
    """Scope state carries across segments: two halves == one run."""
    n = 128 * 60 * 2
    iq = (siggen.carrier(n, -3000.0, FS, amp=0.3)
          + siggen.noise(n, 0.02)).astype(np.complex64)
    audio = siggen.voice_like(n, FS).astype(np.float32)

    m_full, _ = analyze(jnp.asarray(iq), jnp.asarray(audio), scope_init())

    st = scope_init()
    half = n // 2
    _, st = analyze(jnp.asarray(iq[:half]), jnp.asarray(audio[:half]), st)
    m2, _ = analyze(jnp.asarray(iq[half:]), jnp.asarray(audio[half:]), st)

    np.testing.assert_allclose(np.asarray(m2["view"]),
                               np.asarray(m_full["view"]), rtol=1e-4, atol=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.FAST,
                         nr=NRMode.DNR2)
    rx = Receiver(cfg)
    n = 1 << 14
    iq = siggen.ssb_from_audio(siggen.voice_like(n, FS), 10_000.0, FS, "usb", 0.4)

    _, state = rx.process(jnp.asarray(iq), rx.init_state())
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_state(path, state, cfg)
    restored, cfg2 = checkpoint.load_state(path, rx.init_state())
    assert cfg2 == cfg
    for a, b in zip(np.asarray(restored.lms.weights),
                    np.asarray(state.lms.weights)):
        assert a == b


def test_checkpoint_version_skew_missing_leaf(tmp_path):
    """A checkpoint written before the state grew a field still loads.

    Simulates an old .npz (ADVICE r2: pre-conv_tail checkpoints) by deleting
    one leaf from a fresh save; load_state falls back to the template leaf.
    """
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0)
    rx = Receiver(cfg)
    _, state = rx.process(
        jnp.asarray(siggen.ssb_from_audio(
            siggen.voice_like(1 << 13, FS), 10_000.0, FS, "usb", 0.4)),
        rx.init_state())
    path = str(tmp_path / "new.npz")
    checkpoint.save_state(path, state, cfg)

    data = dict(np.load(path))
    dropped = [k for k in data if "tail" in k][0]
    del data[dropped]
    old_path = str(tmp_path / "old.npz")
    np.savez(old_path, **data)

    restored, cfg2 = checkpoint.load_state(old_path, rx.init_state())
    assert cfg2 == cfg
    # the missing leaf came from the (zero) template; the rest restored
    template = rx.init_state()
    flat_r = jax.tree_util.tree_flatten_with_path(restored)[0]
    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    flat_s = dict(jax.tree_util.tree_flatten_with_path(state)[0])
    hit_dropped = False
    for p, v in flat_r:
        key = checkpoint._path_str(p)
        if key == dropped:
            hit_dropped = True
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(flat_t[p]))
    assert hit_dropped


def test_resume_is_exact(tmp_path):
    """Checkpoint mid-stream; resuming yields the identical continuation."""
    cfg = ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                         capture_center_freq=7_050_000.0, agc=AGCMode.FAST)
    rx = Receiver(cfg)
    n = 1 << 15
    iq = siggen.ssb_from_audio(siggen.voice_like(n, FS), 10_000.0, FS, "usb", 0.4)
    half = n // 2

    out_full, _ = rx.process(jnp.asarray(iq), rx.init_state())

    _, state = rx.process(jnp.asarray(iq[:half]), rx.init_state())
    path = str(tmp_path / "mid.npz")
    checkpoint.save_state(path, state, cfg)

    # "power cycle": brand-new receiver restores and continues
    rx2 = Receiver(checkpoint.load_state(path, rx.init_state())[1])
    state2, _ = checkpoint.load_state(path, rx2.init_state())
    out_resumed, _ = rx2.process(jnp.asarray(iq[half:]), state2)

    np.testing.assert_allclose(
        np.asarray(out_resumed["audio_l"]),
        np.asarray(out_full["audio_l"])[half:], atol=1e-6
    )


def test_config_json_roundtrip():
    cfg = ReceiverConfig(mode=DemodMode.SAM, nr=NRMode.SPEC3,
                         pbt_lo=450.0, pbt_hi=3800.0)
    s = checkpoint.config_to_json(cfg)
    assert checkpoint.config_from_json(s) == cfg
