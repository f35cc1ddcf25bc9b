"""Overlap-save engine tests: matmul path == FFT path == direct convolution,
block-streaming == batch (SURVEY.md §4: overlap-save vs direct convolution)."""

import numpy as np
import jax.numpy as jnp
import scipy.signal

from radiodsp_sdr_rx_tpu.ops import fastconv, fir_design

FS = 44117.64706


def _signal(rng, n):
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)


def test_matches_direct_convolution(rng):
    """Steady-state overlap-save output == direct FIR convolution (scipy)."""
    h = fir_design.calc_cplx_fir_coeffs(129, 300.0, 4000.0, FS, 1)
    h_eff = h.copy()
    h_eff[128] = h_eff[128].real  # mask quirk
    mask = fir_design.filter_mask_from_coeffs(h, 256)
    w = jnp.asarray(fir_design.overlap_save_matrix_real(mask))

    x = _signal(rng, 4096)
    tail = jnp.zeros(128, jnp.complex64)
    y, _ = fastconv.overlap_save_filter(jnp.asarray(x), w, tail)
    y = np.asarray(y)

    want = scipy.signal.lfilter(h_eff, [1.0], x.astype(np.complex128))
    # skip the first block: the reference zero-fills the initial tail, which
    # matches lfilter's zero initial state — so actually compare everything
    np.testing.assert_allclose(y, want, rtol=2e-4, atol=2e-4)


def test_fft_path_equals_matmul_path(rng):
    mask_np = fir_design.design_filter_mask(300.0, 4000.0, FS)
    w = jnp.asarray(fir_design.overlap_save_matrix_real(mask_np))
    mask = jnp.asarray(mask_np.astype(np.complex64))

    x = jnp.asarray(_signal(rng, 2048))
    tail = jnp.zeros(128, jnp.complex64)
    y1, t1 = fastconv.overlap_save_filter(x, w, tail)
    y2, t2 = fastconv.overlap_save_filter_fft(x, mask, tail)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-6)


def test_streaming_equals_batch(rng):
    """Processing in 4 segments with carried tails == one-shot batch."""
    mask = fir_design.design_filter_mask(300.0, 4000.0, FS)
    w = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    x = _signal(rng, 4096)

    tail = jnp.zeros(128, jnp.complex64)
    y_batch, _ = fastconv.overlap_save_filter(jnp.asarray(x), w, tail)

    tail = jnp.zeros(128, jnp.complex64)
    parts = []
    for seg in x.reshape(4, -1):
        y, tail = fastconv.overlap_save_filter(jnp.asarray(seg), w, tail)
        parts.append(np.asarray(y))
    y_stream = np.concatenate(parts)
    np.testing.assert_allclose(y_stream, np.asarray(y_batch), atol=1e-5)


def test_frame_overlap_save_layout(rng):
    x = jnp.asarray(_signal(rng, 512))
    tail = jnp.asarray(_signal(rng, 128))
    frames = fastconv.frame_overlap_save(x, tail)
    assert frames.shape == (4, 256)
    np.testing.assert_array_equal(np.asarray(frames[0, :128]), np.asarray(tail))
    np.testing.assert_array_equal(np.asarray(frames[0, 128:]), np.asarray(x[:128]))
    np.testing.assert_array_equal(np.asarray(frames[2, :128]), np.asarray(x[128:256]))


def test_batched_channels(rng):
    """Leading channel axis broadcasts through the filter."""
    mask = fir_design.design_filter_mask(300.0, 4000.0, FS)
    w = jnp.asarray(fir_design.overlap_save_matrix_real(mask))
    x = np.stack([_signal(rng, 1024) for _ in range(3)])
    tail = jnp.zeros((3, 128), jnp.complex64)
    y, new_tail = fastconv.overlap_save_filter(jnp.asarray(x), w, tail)
    assert y.shape == (3, 1024)
    y0, _ = fastconv.overlap_save_filter(jnp.asarray(x[1]), w, tail[0])
    np.testing.assert_allclose(np.asarray(y[1]), np.asarray(y0), atol=1e-6)
