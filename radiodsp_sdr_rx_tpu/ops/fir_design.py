"""Complex windowed-sinc FIR design + overlap-save filter-mask construction.

Reproduces the *math* of the reference filter designer
(ref: src/RadioDSP_SDR_RX/RDSP_convolutional.h:127-185 ``calc_cplx_FIR_coeffs``
and :87-110 ``init_filter_mask``), redesigned for TPU execution:

- Coefficients are designed on host in float64 (the reference uses ``double``).
- The frequency-domain filter mask H = FFT_256(h_zero_padded) is the reference's
  ``FIR_filter_mask``.
- **TPU-first collapse**: the reference's per-block chain
  ``FFT -> mask multiply -> iFFT -> keep right half`` (RDSP_convolutional.h:291-318)
  is a linear map of the 256-sample input frame. We precompute that map once as a
  128x256 complex matrix (a slice of the circulant matrix of h) so the whole
  overlap-save filter becomes a single batched matmul on the MXU instead of a
  chain of VPU FFTs. Retuning the passband (ref ``reInitializeFilter``,
  RDSP_convolutional.h:209-224) is just recomputing this small matrix on host —
  no locking, no critical section: it is an input to the jitted step function.
"""

from __future__ import annotations

import numpy as np

from radiodsp_sdr_rx_tpu.ops.windows import fir_window

DEFAULT_FFT_LENGTH = 256
DEFAULT_NUM_TAPS = DEFAULT_FFT_LENGTH // 2 + 1  # 129 taps (RDSP_convolutional.h:72)


def calc_cplx_fir_coeffs(
    num_taps: int,
    f_lo_cut: float,
    f_hi_cut: float,
    sample_rate: float,
    window_id: int = 1,
) -> np.ndarray:
    """Design complex band-pass FIR coefficients, h[i] = I[i] + j*Q[i].

    Faithful to the reference math (RDSP_convolutional.h:127-185): a windowed-sinc
    low-pass prototype of cutoff (fHi-fLo)/2 is shifted in frequency by
    (fHi+fLo)/2 to place the passband anywhere in [-fs/2, +fs/2]. Negative
    cutoffs are legal (LSB filters). Note the reference applies *no window* to
    the singular center tap (it uses ``z = 2*nFc`` there), which we replicate.

    Returns a complex128 array of shape (num_taps,).
    """
    n_fl = f_lo_cut / sample_rate
    n_fh = f_hi_cut / sample_rate
    n_fc = (n_fh - n_fl) / 2.0  # prototype LP cutoff
    n_fs = np.pi * (n_fh + n_fl)  # frequency-shift (rad/sample * 2)
    f_center = 0.5 * (num_taps - 1)

    i = np.arange(num_taps, dtype=np.float64)
    x = i - f_center
    win = fir_window(window_id, num_taps)

    with np.errstate(divide="ignore", invalid="ignore"):
        z = np.sin(2.0 * np.pi * x * n_fc) / (np.pi * x) * win
    # center-tap singularity: sin(0)/0 == 1 handled as z = 2*nFc, unwindowed
    # (RDSP_convolutional.h:149-150)
    z = np.where(np.abs(x) < 0.01, 2.0 * n_fc, z)

    return (z * np.cos(n_fs * x) + 1j * z * np.sin(n_fs * x)).astype(np.complex128)


def filter_mask_from_coeffs(
    coeffs: np.ndarray,
    fft_length: int = DEFAULT_FFT_LENGTH,
    replicate_reference_tail_quirk: bool = True,
) -> np.ndarray:
    """Frequency-domain filter mask H = FFT(h zero-padded to fft_length).

    This is the reference ``init_filter_mask`` (RDSP_convolutional.h:87-110).
    The reference's zero-fill loop starts at interleaved index ``FFT_length+1``,
    which (for 129 taps and FFT_length 256) zeroes the *imaginary part of the
    last tap* before the FFT — a quirk we replicate by default for bit-parity.
    The last tap's window value is ~6e-5 so the spectral effect is negligible.
    """
    h = np.zeros(fft_length, dtype=np.complex128)
    n = len(coeffs)
    h[:n] = coeffs
    if replicate_reference_tail_quirk and 2 * n > fft_length + 1:
        h[n - 1] = h[n - 1].real  # imag of final tap zeroed (RDSP_convolutional.h:102-105)
    return np.fft.fft(h)


def design_filter_mask(
    f_lo_cut: float,
    f_hi_cut: float,
    sample_rate: float,
    fft_length: int = DEFAULT_FFT_LENGTH,
    num_taps: int | None = None,
    window_id: int = 1,
) -> np.ndarray:
    """Convenience: design coefficients and return the length-``fft_length`` mask."""
    if num_taps is None:
        num_taps = fft_length // 2 + 1
    coeffs = calc_cplx_fir_coeffs(num_taps, f_lo_cut, f_hi_cut, sample_rate, window_id)
    return filter_mask_from_coeffs(coeffs, fft_length)


def overlap_save_matrix(mask: np.ndarray) -> np.ndarray:
    """Collapse the per-frame FFT->mask->iFFT->right-half chain to one matrix.

    For a 256-sample frame x, the reference computes
    ``y = iFFT(mask * FFT(x))[128:]`` (RDSP_convolutional.h:291-318). That is
    ``y = (F^-1 diag(H) F x)[128:]``, and ``F^-1 diag(H) F`` is the circulant
    matrix of ``h = iFFT(H)``; so ``A[m, n] = h[(m+128-n) mod 256]`` for
    m in [0,128). A is 128x256 complex.
    """
    fft_length = len(mask)
    half = fft_length // 2
    h = np.fft.ifft(mask)
    m = np.arange(half)[:, None] + half
    n = np.arange(fft_length)[None, :]
    return h[(m - n) % fft_length].astype(np.complex128)


def overlap_save_matrix_real(mask: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Real-stacked form of :func:`overlap_save_matrix` for one MXU matmul.

    Returns W of shape (2*fft_length, fft_length): with input frames laid out as
    ``X = [Re | Im]`` of shape (batch, 2*fft_length), the filtered right-half
    output is ``Y = X @ W`` with ``Y = [Re | Im]`` of shape (batch, fft_length).
    """
    a = overlap_save_matrix(mask)
    ar, ai = a.real, a.imag
    # y_r = x_r @ Ar.T - x_i @ Ai.T ; y_i = x_r @ Ai.T + x_i @ Ar.T
    top = np.concatenate([ar.T, ai.T], axis=1)
    bot = np.concatenate([-ai.T, ar.T], axis=1)
    return np.concatenate([top, bot], axis=0).astype(dtype)
