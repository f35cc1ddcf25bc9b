"""Native host-IO runtime tests: ring buffer semantics, drop counters,
q15 CMSIS parity with the JAX ops, WAV streaming, threaded producer/consumer."""

import threading
import wave

import numpy as np
import pytest

from radiodsp_sdr_rx_tpu.utils import native_io


@pytest.fixture(scope="module")
def lib():
    try:
        return native_io.load()
    except Exception as e:  # g++ missing etc.
        pytest.skip(f"native build unavailable: {e}")


def test_ring_roundtrip(lib):
    ring = native_io.IQRing(1024)
    iq = (np.random.default_rng(0).standard_normal(256)
          + 1j * np.random.default_rng(1).standard_normal(256)).astype(np.complex64) * 0.3
    pushed = ring.push_complex(iq)
    assert pushed == 256
    assert ring.available == 256
    out = ring.pop_complex(256)
    # q15 round-trip quantization
    np.testing.assert_allclose(out.real, np.trunc(iq.real * 32768) / 32768, atol=1e-6)
    np.testing.assert_allclose(out.imag, np.trunc(iq.imag * 32768) / 32768, atol=1e-6)
    assert ring.available == 0
    ring.close()


def test_ring_overrun_drops(lib):
    ring = native_io.IQRing(100)
    iq = np.ones(150, np.complex64) * 0.1
    pushed = ring.push_complex(iq)
    assert pushed == 100
    assert ring.dropped == 50
    stats = ring.stats
    assert stats["pushed"] == 100 and stats["dropped"] == 50
    ring.close()


def test_ring_wraparound(lib):
    ring = native_io.IQRing(128)
    rng = np.random.default_rng(3)
    total_in, total_out = [], []
    for _ in range(10):
        iq = (rng.standard_normal(96) * 0.2).astype(np.complex64)
        ring.push_complex(iq)
        total_in.append(np.trunc(iq.real * 32768) / 32768)
        total_out.append(ring.pop_complex(96).real)
    np.testing.assert_allclose(np.concatenate(total_out),
                               np.concatenate(total_in), atol=1e-6)
    ring.close()


def test_q15_matches_jax_ops(lib):
    """Native conversion == ops.qformat (CMSIS semantics both ways)."""
    import jax.numpy as jnp
    from radiodsp_sdr_rx_tpu.ops import qformat

    f = np.asarray([0.0, 0.5, -0.5, 0.99999, -1.0, 1.0, 2.0, -2.0, 3e-5],
                   np.float32)
    native_q = native_io.float_to_q15_native(f)
    jax_q = np.asarray(qformat.float_to_q15(jnp.asarray(f)))
    np.testing.assert_array_equal(native_q, jax_q)

    q = np.asarray([-32768, -1, 0, 1, 32767, 12345], np.int16)
    np.testing.assert_allclose(native_io.q15_to_float_native(q),
                               np.asarray(qformat.q15_to_float(jnp.asarray(q))))


def test_native_wav_reader(lib, tmp_path):
    path = str(tmp_path / "iq.wav")
    rng = np.random.default_rng(5)
    iq = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64) * 0.2
    frames = np.empty((1000, 2), "<i2")
    frames[:, 0] = np.clip(np.trunc(iq.real * 32768), -32768, 32767)
    frames[:, 1] = np.clip(np.trunc(iq.imag * 32768), -32768, 32767)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44118)
        w.writeframes(frames.tobytes())

    r = native_io.NativeWavReader(path)
    assert r.sample_rate == 44118
    assert r.channels == 2
    got = np.concatenate([r.read_complex(300), r.read_complex(300),
                          r.read_complex(500)])
    assert len(got) == 1000
    np.testing.assert_allclose(got.real, frames[:, 0] / 32768.0, atol=1e-6)
    r.close()


def test_threaded_producer_consumer(lib):
    """Real-time shape: capture thread pushes, feeder pops; no corruption."""
    ring = native_io.IQRing(4096)
    n_blocks, block = 200, 128
    src = (np.arange(n_blocks * block) % 1000 / 2000.0).astype(np.float32)
    src_iq = (src + 1j * src).astype(np.complex64)

    def producer():
        # backpressure: retry the unpushed remainder so nothing is dropped
        # (the real-time feeder would instead let drops happen and count them)
        for b in range(n_blocks):
            seg = src_iq[b * block:(b + 1) * block]
            while len(seg):
                pushed = ring.push_complex(seg)
                seg = seg[pushed:]

    out = []
    t = threading.Thread(target=producer)
    t.start()
    got = 0
    while got < n_blocks * block:
        chunk = ring.pop_complex(block)
        if len(chunk):
            out.append(chunk)
            got += len(chunk)
    t.join()
    result = np.concatenate(out)
    want = np.trunc(src * 32768) / 32768
    np.testing.assert_allclose(result.real, want, atol=1e-6)
    # note: `dropped` counts every rejected sample, including ones the
    # backpressuring producer later retried — it is an overrun indicator,
    # not a data-loss count when the producer retries.
    ring.close()
