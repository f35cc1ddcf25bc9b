"""FIR designer unit tests vs independent NumPy/SciPy oracles (SURVEY.md §4:
windowed-sinc coeffs vs RDSP_convolutional.h:127-185 math)."""

import numpy as np
import pytest

from radiodsp_sdr_rx_tpu.ops import fir_design
from radiodsp_sdr_rx_tpu.ops.windows import fir_window

FS = 44117.64706


def oracle_coeffs(num_taps, flo, fhi, fs, window_id):
    """Literal transcription of the reference loop as an independent oracle."""
    nfl = flo / fs
    nfh = fhi / fs
    nfc = (nfh - nfl) / 2.0
    nfs = np.pi * (nfh + nfl)
    fc = 0.5 * (num_taps - 1)
    out = np.zeros(num_taps, np.complex128)
    for i in range(num_taps):
        x = i - fc
        if abs(i - fc) < 0.01:
            z = 2.0 * nfc
        else:
            w = fir_window(window_id, num_taps)[i]
            z = np.sin(2 * np.pi * x * nfc) / (np.pi * x) * w
        out[i] = z * np.cos(nfs * x) + 1j * z * np.sin(nfs * x)
    return out


@pytest.mark.parametrize("window_id", [1, 2, 3, 4, 0])
def test_coeffs_match_reference_math(window_id):
    got = fir_design.calc_cplx_fir_coeffs(129, 300.0, 4000.0, FS, window_id)
    want = oracle_coeffs(129, 300.0, 4000.0, FS, window_id)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-15)


def test_bandpass_response():
    """The designed 300-4000 Hz band-pass must pass in-band and reject out-of-band."""
    h = fir_design.calc_cplx_fir_coeffs(129, 300.0, 4000.0, FS, 1)
    freqs = np.fft.fftfreq(8192, 1.0 / FS)
    resp = np.abs(np.fft.fft(h, 8192))
    inband = resp[(freqs > 800) & (freqs < 3500)]
    stop_neg = resp[(freqs < -1000)]
    stop_hi = resp[(freqs > 6000)]
    assert inband.min() > 0.7
    assert stop_neg.max() < 1e-3  # complex filter: negative frequencies rejected
    assert stop_hi.max() < 1e-3


def test_lsb_band():
    """Negative-band filter (LSB) passes negative frequencies only."""
    h = fir_design.calc_cplx_fir_coeffs(129, -3000.0, -300.0, FS, 1)
    freqs = np.fft.fftfreq(8192, 1.0 / FS)
    resp = np.abs(np.fft.fft(h, 8192))
    assert resp[(freqs < -800) & (freqs > -2500)].min() > 0.7
    assert resp[(freqs > 1000)].max() < 1e-3


def test_mask_is_fft_of_padded_coeffs():
    h = fir_design.calc_cplx_fir_coeffs(129, 300.0, 4000.0, FS, 1)
    mask = fir_design.filter_mask_from_coeffs(h, 256)
    padded = np.zeros(256, np.complex128)
    padded[:129] = h
    padded[128] = padded[128].real  # reference tail quirk (RDSP_convolutional.h:102)
    np.testing.assert_allclose(mask, np.fft.fft(padded), rtol=1e-12, atol=1e-14)


def test_overlap_save_matrix_equals_fft_chain(rng):
    """A @ frame == ifft(mask * fft(frame))[128:] for random frames."""
    mask = fir_design.design_filter_mask(300.0, 4000.0, FS)
    a = fir_design.overlap_save_matrix(mask)
    frame = rng.standard_normal(256) + 1j * rng.standard_normal(256)
    want = np.fft.ifft(np.fft.fft(frame) * mask)[128:]
    got = a @ frame
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_overlap_save_matrix_real_form(rng):
    mask = fir_design.design_filter_mask(300.0, 4000.0, FS)
    a = fir_design.overlap_save_matrix(mask)
    w = fir_design.overlap_save_matrix_real(mask, dtype=np.float64)
    frame = rng.standard_normal(256) + 1j * rng.standard_normal(256)
    x = np.concatenate([frame.real, frame.imag])
    y = x @ w
    got = y[:128] + 1j * y[128:]
    np.testing.assert_allclose(got, a @ frame, rtol=1e-9, atol=1e-12)
