"""NumPy straight-ports of the reference's main-loop DSP — TEST ORACLES ONLY.

VERDICT r4 #9 asked for a chain-level golden whose oracle is *transcribed
reference code*, not the framework itself. This module transcribes the
reference's conv + LMS main loop literally (float64 NumPy; ``np.fft.fft``
has the same sign/scaling conventions as ``arm_cfft_f32`` forward /
inverse-with-1/N). Nothing here is framework code; tests compare the
framework's MXU/Pallas chain against these functions.

Transcribed routines (citations into /root/reference):
  - ``fir_mask``              RDSP_convolutional.h:87-110 (init_filter_mask)
                              on RDSP_convolutional.h:127-185 coefficients
                              (via test_fir_design.oracle_coeffs)
  - ``RefLMSNorm``            RDSP_noise_reduction.h:35-80 + CMSIS
                              arm_lms_norm_f32 semantics, incl. the 256+128
                              circular de-correlation delay line and its
                              first-call d = x quirk
  - ``conv_lms_loop``         RDSP_convolutional.h:228-353 — the whole
                              overlap-save frame loop: first-block zero
                              fill, z = L + jR packing, FFT -> mask mult
                              (or bypass) -> iFFT, right-half keep, LMS on
                              L with x1.1 makeup and R <- L
  - ``inline_denoise_loop``   src/backup/RadioDSP_SDR_RX_Conv.ino:1520-1650
                              (doConvolutionalProcessing_Denoise): magnitude
                              subtraction with threshold = mean(mag[60..120])
                              / 60 * 3, original phase resynthesis, no mask
"""

from __future__ import annotations

import numpy as np

from test_fir_design import oracle_coeffs


def fir_mask(flo, fhi, fs, num_taps=129, n_fft=256, window_id=0):
    """init_filter_mask (RDSP_convolutional.h:87-110): complex coeffs
    zero-padded to FFT_length, forward FFT."""
    c = oracle_coeffs(num_taps, flo, fhi, fs, window_id)
    buf = np.zeros(n_fft, np.complex128)
    buf[:num_taps] = c
    return np.fft.fft(buf)


def ref_mu(strength: float) -> float:
    """Init_LMS_NR mu law (RDSP_noise_reduction.h:48-56)."""
    mu = strength / 2.0
    mu += 2.0
    mu /= 10.0
    mu = 10.0 ** mu
    return 1.0 / mu


class RefLMSNorm:
    """arm_lms_norm_f32 + the reference wrapper's delay-line statics
    (RDSP_noise_reduction.h:66-80): a 256-sample circular buffer where the
    adaptive filter's desired signal is the input delayed by 128 samples
    (first call: the just-written block, i.e. d = x)."""

    TAPS = 96

    def __init__(self, mu: float):
        self.mu = float(mu)
        self.w = np.zeros(self.TAPS)
        self.win = np.zeros(self.TAPS)
        self.delay = np.zeros(256 + 128)
        self.inbuf = 0
        self.outbuf = 0   # statics update AFTER the filter call (:75-78):
        # the first call therefore reads the block it just wrote (d = x)

    def process_block(self, x: np.ndarray) -> np.ndarray:
        """LMS_NoiseReduction(128, x): returns the filter output y (pOut)."""
        assert len(x) == 128
        self.delay[self.inbuf : self.inbuf + 128] = x
        d = self.delay[self.outbuf : self.outbuf + 128]
        y = np.zeros(128)
        for i in range(128):
            self.win = np.concatenate([self.win[1:], [x[i]]])
            yi = self.w @ self.win
            e = d[i] - yi
            energy = self.win @ self.win
            self.w = self.w + (self.mu * e / (energy + 1.1920929e-7)) * self.win
            y[i] = yi
        self.inbuf = (self.inbuf + 128) % 256
        self.outbuf = (self.inbuf + 128) % 256
        return y


def conv_lms_loop(a_l, a_r, mask, nr_level=0.0, filter_enabled=True,
                  n_fft=256):
    """doConvolutionalProcessing (RDSP_convolutional.h:228-353), FFT_L=256:
    per 128-sample block, overlap-save fast convolution of z = L + jR with
    the complex mask, then (nr_level > 0) LMS denoise on L, x1.1 makeup
    gain, mono copy R <- L. Returns (out_l, out_r)."""
    half = n_fft // 2
    n = len(a_l) // half * half
    last_l = np.zeros(half)
    last_r = np.zeros(half)
    first = True
    lms = RefLMSNorm(ref_mu(nr_level)) if nr_level > 0 else None
    out_l, out_r = [], []
    for off in range(0, n, half):
        cur_l = np.asarray(a_l[off : off + half], np.float64)
        cur_r = np.asarray(a_r[off : off + half], np.float64)
        if first:
            left = np.zeros(half, np.complex128)   # first_block zero fill
            first = False
        else:
            left = last_l + 1j * last_r
        z = np.concatenate([left, cur_l + 1j * cur_r])
        last_l, last_r = cur_l, cur_r
        spec = np.fft.fft(z)
        if filter_enabled:
            spec = spec * mask
        y = np.fft.ifft(spec)
        fl = y.real[half:].copy()
        fr = y.imag[half:].copy()
        if lms is not None:
            fl = lms.process_block(fl)
            fl = fl * 1.1                          # makeup (:334)
            fr = fl.copy()                         # mono copy R <- L (:335)
        out_l.append(fl)
        out_r.append(fr)
    return np.concatenate(out_l), np.concatenate(out_r)


def inline_denoise_loop(xr, xi, n_fft=256):
    """doConvolutionalProcessing_Denoise (Conv.ino:1520-1650): overlap-save
    frames of the complex stream, per-frame threshold = (sum of magnitude
    bins 60..120) / 60 * 3, over-subtraction (<= th -> x0.2, else - th),
    resynthesis with the original phase, iFFT, right half out. No FIR mask
    (commented out, :1633). Returns (xr', xi')."""
    half = n_fft // 2
    n = len(xr) // half * half
    last = np.zeros(half, np.complex128)
    first = True
    out_r, out_i = [], []
    for off in range(0, n, half):
        cur = (np.asarray(xr[off : off + half], np.float64)
               + 1j * np.asarray(xi[off : off + half], np.float64))
        left = np.zeros(half, np.complex128) if first else last
        first = False
        z = np.concatenate([left, cur])
        last = cur
        spec = np.fft.fft(z)
        mag = np.abs(spec)
        th = mag[60:121].sum() / 60.0 * 3.0        # 61 bins / 60 (:1593-1596)
        mag2 = np.where(mag <= th, mag * 0.2, mag - th)
        phi = np.angle(spec)
        y = np.fft.ifft(mag2 * np.exp(1j * phi))
        out_r.append(y.real[half:].copy())
        out_i.append(y.imag[half:].copy())
    return np.concatenate(out_r), np.concatenate(out_i)
