"""Audio playback sink (utils/audio_sink.py) — the reference's speaker path
(RadioDSP_SDR_RX.ino:88-89, codec setup :160-169) as a host PCM sink."""

import numpy as np
import pytest

from radiodsp_sdr_rx_tpu.utils.audio_sink import AudioSink

FS = 44117.64706


def test_sink_pipes_pcm_to_command(tmp_path):
    """A custom sink command receives the full s16le interleaved stream."""
    out = tmp_path / "sink.pcm"
    sink = AudioSink(FS, channels=2,
                     command=["/bin/sh", "-c", f"cat > {out}"])
    assert sink.available and sink.backend == "/bin/sh"
    n = 4096
    t = np.arange(n) / FS
    block = np.stack([np.sin(2 * np.pi * 440 * t),
                      np.cos(2 * np.pi * 440 * t)], axis=1).astype(np.float32)
    for _ in range(3):
        sink.write(block)
    sink.close()
    data = np.frombuffer(out.read_bytes(), "<i2").reshape(-1, 2)
    assert data.shape == (3 * n, 2)
    # first block round-trips (s16 quantization)
    np.testing.assert_allclose(data[:n] / 32767.0, block, atol=1e-4)
    assert sink.stats["written"] == 3 * n and sink.stats["dropped"] == 0


def test_sink_mono_is_duplicated(tmp_path):
    out = tmp_path / "mono.pcm"
    sink = AudioSink(FS, channels=2,
                     command=["/bin/sh", "-c", f"cat > {out}"])
    sink.write(np.full(128, 0.5, np.float32))
    sink.close()
    data = np.frombuffer(out.read_bytes(), "<i2").reshape(-1, 2)
    assert data.shape == (128, 2)
    assert np.all(data[:, 0] == data[:, 1])


def test_sink_headless_degrades_gracefully(monkeypatch):
    """No backend found -> available=False, writes are safe no-ops."""
    import radiodsp_sdr_rx_tpu.utils.audio_sink as mod

    monkeypatch.setattr(mod, "_discover", lambda fs, ch: None)
    sink = mod.AudioSink(FS)
    assert not sink.available
    sink.write(np.zeros(256, np.float32))   # must not raise
    sink.close()


@pytest.mark.slow
def test_sink_backpressure_drops_oldest(tmp_path):
    """A stalled sink never blocks the DSP loop; drops are counted."""
    sink = AudioSink(FS, channels=2, queue_blocks=2,
                     command=["/bin/sh", "-c", "sleep 30"])
    # 128 KiB blocks: one fills the OS pipe buffer, so the queue backs up
    block = np.zeros((32768, 2), np.float32)
    for _ in range(20):
        sink.write(block)          # returns immediately every time
    assert sink.dropped >= 8
    sink._proc.kill()
    sink.close()


def test_cli_tui_play_cmd(tmp_path):
    """`tui --play-cmd` drives demodulated audio into the sink process —
    the listenable-radio path, exercised headless via a file sink."""
    from radiodsp_sdr_rx_tpu.cli import main
    from radiodsp_sdr_rx_tpu.utils import io as io_utils
    from radiodsp_sdr_rx_tpu.utils import siggen

    n = 4096 * 3
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    cap = str(tmp_path / "capture.wav")
    io_utils.write_wav(cap, np.stack([iq.real, iq.imag], 1), FS)
    pcm = tmp_path / "tui.pcm"
    rc = main(["tui", cap, "--mode", "usb", "--vfo", "7060000",
               "--center", "7050000", "--agc", "off",
               "--block", "4096", "--frames", "3",
               "--play-cmd", f"/bin/sh -c 'cat > {pcm}'"])
    assert rc == 0
    data = np.frombuffer(pcm.read_bytes(), "<i2").reshape(-1, 2)
    assert len(data) == 3 * 4096
    # the sink stream contains the demodulated 1 kHz tone
    spec = np.abs(np.fft.rfft(data[4096:, 0].astype(np.float64)))
    freqs = np.fft.rfftfreq(len(data) - 4096, 1 / FS)
    assert abs(freqs[spec.argmax()] - 1000.0) < 40.0
