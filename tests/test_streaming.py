"""StreamingReceiver tests: ring-fed demod == direct batch demod."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from radiodsp_sdr_rx_tpu.models.config import AGCMode, DemodMode, ReceiverConfig
from radiodsp_sdr_rx_tpu.models.receiver import Receiver
from radiodsp_sdr_rx_tpu.models.streaming import StreamingReceiver
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


@pytest.fixture
def cfg():
    return ReceiverConfig(mode=DemodMode.USB, vfo_freq=7_060_000.0,
                          capture_center_freq=7_050_000.0, agc=AGCMode.FAST)


def _capture(n):
    audio_in = siggen.voice_like(n, FS)
    return siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)


def test_ring_streaming_matches_batch(cfg):
    n = 1 << 16
    iq = _capture(n)
    sr = StreamingReceiver(cfg, block=8192)
    audio_stream = sr.run_file(iq, chunk=20000)

    rx = Receiver(cfg)
    out, _ = rx.process(iq, rx.init_state())
    want = np.asarray(out["audio_l"])
    # q15 ring quantization at the boundary dominates the tiny differences
    np.testing.assert_allclose(audio_stream, want[: len(audio_stream)], atol=2e-3)
    assert len(audio_stream) == n
    assert sr.stats["dropped"] == 0
    sr.close()


def test_threaded_producer(cfg):
    n = 1 << 16
    iq = _capture(n)
    sr = StreamingReceiver(cfg, block=8192, ring_capacity=1 << 15)
    outs = []
    done = threading.Event()

    def producer():
        pos = 0
        while pos < n:
            acc = sr.push(iq[pos : pos + 4096])
            pos += acc if acc else 0
        done.set()

    t = threading.Thread(target=producer)
    t.start()
    total = 0
    while total < n:
        for chunk in sr.process_available():
            total += len(chunk)
            outs.append(chunk)
    t.join()
    audio = np.concatenate(outs)
    assert len(audio) == n
    assert np.isfinite(audio).all()
    sr.close()


def test_metrics_during_streaming(cfg):
    n = 1 << 16
    iq = _capture(n)
    sr = StreamingReceiver(cfg, block=128 * 64, metrics=True)
    sr.run_file(iq)
    assert sr.last_metrics is not None
    assert sr.last_metrics["waterfall"].shape == (50, 128)
    sr.close()
