"""Profiling utility smoke tests + configurable FFT length test."""

import numpy as np
import jax.numpy as jnp
import pytest

from radiodsp_sdr_rx_tpu.models.config import AGCMode, DemodMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.receiver import Receiver
from radiodsp_sdr_rx_tpu.utils import profiling, siggen

FS = 44117.64706


def test_time_stage_runs():
    import jax

    f = jax.jit(lambda a: a * 2.0)
    x = jnp.ones((8, 1024), jnp.float32)
    t = profiling.time_stage(f, x, reps=3, warmup=1)
    assert t["seconds_per_call"] > 0


def test_stage_report_runs():
    rep = profiling.stage_report(n_channels=4, seg_len=1 << 13, reps=2)
    assert set(rep) == {"nco_mix", "ssb_filter_demod", "agc", "pbt_filter"}
    for v in rep.values():
        assert v["msamples_per_s"] > 0


def test_fft_length_512():
    """The backup sketch's selectable FFT length (256..4096,
    src/backup/RadioDSP_SDR_RX_Conv.ino:1371-1398) — honored end-to-end via
    ReceiverConfig.fft_length (257-tap FIR, 256-sample blocks)."""
    n = 1 << 15
    cfg = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=7_060_000.0,
        capture_center_freq=7_050_000.0, agc=AGCMode.OFF, fft_length=512,
    )
    rx = Receiver(cfg)
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    out, state = rx.process(iq, rx.init_state())
    a = np.asarray(out["audio_l"])[8000:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    freqs = np.fft.rfftfreq(len(a), 1 / FS)
    assert abs(freqs[spec.argmax()] - 1000.0) < 30.0
    # sharper filter than the 129-tap default: check stopband at -52 dB
    stop = spec[(freqs > 5000) & (freqs < 15000)].max()
    assert stop < spec.max() * 3e-3
    # streaming with 256-sample tails still exact
    out1, st = rx.process(iq[: n // 2], rx.init_state())
    out2, _ = rx.process(iq[n // 2 :], st)
    np.testing.assert_allclose(
        np.concatenate([out1["audio_l"], out2["audio_l"]]),
        np.asarray(out["audio_l"]), atol=1e-5,
    )


def test_trace_context(tmp_path):
    import jax

    with profiling.trace(str(tmp_path / "trace")):
        x = jax.jit(lambda a: a * 3.0)(jnp.ones(128, jnp.float32))
        jax.block_until_ready(x)
    # jax.profiler writes a subdirectory of trace events
    import os
    assert any(os.scandir(str(tmp_path / "trace")))


def test_public_import_surface():
    """Everything the README/API docs mention is importable."""
    import radiodsp_sdr_rx_tpu as pkg
    from radiodsp_sdr_rx_tpu.models.channelized import ChannelizedBank  # noqa
    from radiodsp_sdr_rx_tpu.models.fused import FusedSSBBank  # noqa
    from radiodsp_sdr_rx_tpu.models.streaming import StreamingReceiver  # noqa
    from radiodsp_sdr_rx_tpu.ops import decimate, channelizer, planar  # noqa
    from radiodsp_sdr_rx_tpu.ops.pallas_lms import lms_nr_run_pallas  # noqa
    from radiodsp_sdr_rx_tpu.parallel import (  # noqa
        make_mesh, sharded_panadapter, make_bank_time_sharded_chain,
    )
    from radiodsp_sdr_rx_tpu.utils import checkpoint, profiling, scenes  # noqa
    assert pkg.SAMPLE_RATE == 44117.64706


@pytest.mark.parametrize("fft_l", [1024, 2048, 4096])
def test_fft_length_selectable(fft_l):
    """Backup sketch FFT_L range 256..4096 (RadioDSP_SDR_RX_Conv.ino:1371-1398)
    beyond the 512 case: end-to-end demod + exact streaming carry."""
    n = 1 << 15
    cfg = ReceiverConfig(
        mode=DemodMode.USB, vfo_freq=7_060_000.0,
        capture_center_freq=7_050_000.0, agc=AGCMode.OFF, fft_length=fft_l,
    )
    rx = Receiver(cfg)
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    out, _ = rx.process(iq, rx.init_state())
    a = np.asarray(out["audio_l"])[8000:]
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a))))
    freqs = np.fft.rfftfreq(len(a), 1 / FS)
    assert abs(freqs[spec.argmax()] - 1000.0) < 30.0
    out1, st = rx.process(iq[: n // 2], rx.init_state())
    out2, _ = rx.process(iq[n // 2:], st)
    np.testing.assert_allclose(
        np.concatenate([out1["audio_l"], out2["audio_l"]]),
        np.asarray(out["audio_l"]), atol=1e-5)
