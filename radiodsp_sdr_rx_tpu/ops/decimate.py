"""Decimating filters and the digital down-converter (DDC).

The reference runs everything at the codec rate (44117.647 Hz) with no rate
changes; production SDR front ends capture wideband and decimate to channel
rate (the "FIR band-pass/decimation" and "polyphase" kernels named in
BASELINE.json's north star; cf. the retrieved polyphase-filter papers in
PAPERS.md). TPU-native formulation:

- A decimate-by-M FIR is the overlap-save filter keeping every M-th output —
  i.e. a **row slice of the collapsed operator** (fir_design.overlap_save_matrix):
  ``A_dec = A[::M]`` of shape (F/2/M, F). The whole decimating filter stays one
  MXU matmul, with compute reduced by M for free (the discarded outputs are
  never computed). This *is* the polyphase identity — commuting the
  downsampler through the filter — expressed at the operator level.
- A DDC = NCO mix + decimating low-pass: ``ddc_planar`` chains the drift-free
  DDS mixer with the sliced operator; the anti-alias low-pass is designed with
  the same windowed-sinc machinery (complex band ±bw/2).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops import planar
from radiodsp_sdr_rx_tpu.ops.fir_design import (
    design_filter_mask,
    overlap_save_matrix,
)


def decimating_operator(mask: np.ndarray, factor: int) -> np.ndarray:
    """Real-stacked decimating overlap-save operator.

    Returns W of shape (2F, F/2/M * 2): with frames ``X = [Re | Im]`` of shape
    (nb, 2F), ``Y = X @ W`` gives ``[Re | Im]`` of the M-decimated filtered
    block (F/2/M complex outputs per 128 input samples).
    """
    fft_length = len(mask)
    half = fft_length // 2
    if half % factor:
        raise ValueError(f"block {half} not divisible by factor {factor}")
    a = overlap_save_matrix(mask)[::factor]          # (half/M, F) complex
    ar, ai = a.real, a.imag
    top = np.concatenate([ar.T, ai.T], axis=1)       # (F, 2*half/M)
    bot = np.concatenate([-ai.T, ar.T], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


def design_decimator(
    factor: int,
    sample_rate: float,
    fft_length: int = 256,
    cutoff_scale: float = 0.8,
    window_id: int = 1,
) -> np.ndarray:
    """Anti-alias low-pass operator for decimate-by-``factor``: passband
    ±(fs/2M)*cutoff_scale, complex symmetric."""
    bw = sample_rate / (2.0 * factor) * cutoff_scale
    mask = design_filter_mask(-bw, bw, sample_rate, fft_length,
                              window_id=window_id)
    return decimating_operator(mask, factor)


def decimating_filter_planar(
    xr: jax.Array,
    xi: jax.Array,
    w_dec: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
):
    """Filter + decimate a planar stream with the sliced MXU operator.

    xr, xi: (..., n); w_dec: (2F, 2*half/M); tails: (..., F/2).
    Returns (yr, yi, new_tail_r, new_tail_i) with outputs of length n/M.
    """
    two_f = w_dec.shape[0]
    fft_length = two_f // 2
    block = fft_length // 2
    out_half = w_dec.shape[1] // 2
    fr = planar.frame_planar(xr, tail_r, block)
    fi = planar.frame_planar(xi, tail_i, block)
    x2 = jnp.concatenate([fr, fi], axis=-1)
    y = jnp.matmul(x2, w_dec, precision=precision)   # (..., nb, 2*out_half)
    yr = y[..., :out_half].reshape(*xr.shape[:-1], -1)
    yi = y[..., out_half:].reshape(*xr.shape[:-1], -1)
    return yr, yi, xr[..., -block:], xi[..., -block:]


def ddc_planar(
    xr: jax.Array,
    xi: jax.Array,
    phase0,
    phase_inc,
    w_dec: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
):
    """Digital down-converter: NCO mix to baseband + decimating low-pass.

    Returns (yr, yi, next_phase, new_tail_r, new_tail_i); output rate is
    input rate / M. The tails carry the *mixed* stream (the filter sees the
    baseband signal), so streaming segments stay exact.
    """
    mr, mi, next_phase = planar.nco_mix_planar(xr, xi, phase0, phase_inc)
    yr, yi, tr, ti = decimating_filter_planar(mr, mi, w_dec, tail_r, tail_i)
    return yr, yi, next_phase, tr, ti
