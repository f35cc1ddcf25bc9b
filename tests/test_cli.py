"""CLI end-to-end tests: demod/scope/stream on a synthetic capture file."""

import numpy as np

from radiodsp_sdr_rx_tpu.cli import main
from radiodsp_sdr_rx_tpu.utils import io as io_utils
from radiodsp_sdr_rx_tpu.utils import siggen

FS = 44117.64706


def _make_capture(tmp_path, n=1 << 16):
    audio_in = np.sin(2 * np.pi * 1000.0 * np.arange(n) / FS)
    iq = siggen.ssb_from_audio(audio_in, 10_000.0, FS, "usb", amp=0.4)
    path = str(tmp_path / "capture.wav")
    frames = np.stack([iq.real, iq.imag], 1)
    io_utils.write_wav(path, frames, FS)
    return path


def test_cli_demod(tmp_path, capsys):
    cap = _make_capture(tmp_path)
    out = str(tmp_path / "audio.wav")
    rc = main(["demod", cap, "--mode", "usb", "--vfo", "7060000",
               "--center", "7050000", "--agc", "off", "--out", out])
    assert rc == 0
    audio, fs = io_utils.read_iq_wav(out)  # stereo read: L + jR
    a = np.asarray(audio.real)
    spec = np.abs(np.fft.rfft(a[8000:] * np.hanning(len(a) - 8000)))
    freqs = np.fft.rfftfreq(len(a) - 8000, 1 / fs)
    peak_freq = freqs[spec.argmax()]
    assert abs(peak_freq - 1000.0) < 30.0


def test_cli_scope(tmp_path, capsys):
    cap = _make_capture(tmp_path, n=128 * 31 * 10)
    rc = main(["scope", cap, "--center", "7050000"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "S-meter" in out and "panadapter" in out
    assert len(out.splitlines()) > 60  # spectrum + waterfall art


def test_cli_stream(tmp_path, capsys):
    cap = _make_capture(tmp_path)
    out = str(tmp_path / "audio2.wav")
    rc = main(["stream", cap, "--mode", "usb", "--vfo", "7060000",
               "--center", "7050000", "--agc", "off", "--out", out])
    assert rc == 0
    txt = capsys.readouterr().out
    assert "streamed" in txt
    audio, _ = io_utils.read_iq_wav(out)
    assert len(audio) > 0


def test_cli_info(capsys):
    assert main(["info"]) == 0
    assert "devices" in capsys.readouterr().out


def test_cli_scan(tmp_path, capsys):
    n = 1 << 16
    iq = (siggen.am_signal(n, 10_000.0, mod_hz=400.0, fs=FS, amp=0.5)
          + siggen.noise(n, 0.01)).astype(np.complex64)
    path = str(tmp_path / "band.wav")
    io_utils.write_wav(path, np.stack([iq.real, iq.imag], 1), FS)
    rc = main(["scan", path, "--center", "7050000", "--channels", "64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MHz" in out and "ch " in out
    # the hot channel sits at +10 kHz: channel round(10000/(FS/64)) = 15
    assert " 15 " in out or "ch   15" in out


def test_cli_scope_dual(tmp_path, capsys):
    cap = _make_capture(tmp_path)
    rc = main(["scope", cap, "--center", "7050000", "--mode", "usb",
               "--vfo", "7060000", "--dual"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "RX-SCOPE" in out and "AF-FFT" in out
