"""Overlap-save fast-convolution filtering as batched TPU ops.

The reference runs one 256-point FFT / mask multiply / iFFT per 128 new samples,
sequentially, carrying the previous 128 samples (ref:
src/RadioDSP_SDR_RX/RDSP_convolutional.h:228-353). On TPU the key observation is
that overlap-save has **no serial dependency between blocks**: block b's output
depends only on input samples [128b-128, 128b+128). So a whole capture is
filtered in one shot:

  1. frame the stream into 50%-overlapped 256-sample frames (pure reshape/concat)
  2. apply the filter to all frames at once, either
     a. ``overlap_save_filter``      — one real matmul on the MXU with the
        precomputed 128x256 collapsed operator (fastest; see fir_design.py), or
     b. ``overlap_save_filter_fft``  — batched FFT -> mask -> iFFT, the
        reference's exact math (used as oracle / for large FFT lengths).

The only carried state is the 128-sample tail of the previous segment — which is
exactly the halo exchanged between devices when sharding long streams over the
time axis (parallel/stream_shard.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def frame_overlap_save(x: jax.Array, tail: jax.Array, block: int = 128) -> jax.Array:
    """Frame a stream into 50%-overlapped frames of length ``2*block``.

    x:    (..., n) complex64, n a multiple of ``block``
    tail: (..., block) complex64 — the previous segment's last block (zeros at
          stream start; the reference's ``first_block`` zero-fill,
          RDSP_convolutional.h:256-263).

    Returns frames of shape (..., n/block, 2*block): frame b = [x[b-1] | x[b]]
    (with the tail standing in for block -1), matching the reference's
    [last_sample_buffer | float_buffer] assembly (RDSP_convolutional.h:265-285).
    """
    n = x.shape[-1]
    nb = n // block
    padded = jnp.concatenate([tail, x], axis=-1)
    blocks = padded.reshape(*x.shape[:-1], nb + 1, block)
    return jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1)


def overlap_save_filter(
    x: jax.Array,
    w_real: jax.Array,
    tail: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array]:
    """Filter a stream via the collapsed overlap-save operator on the MXU.

    x:      (..., n) complex64 IQ stream (n multiple of fft_length/2)
    w_real: (2*fft_length, fft_length) f32, from
            ``fir_design.overlap_save_matrix_real`` — encodes
            FFT->mask->iFFT->right-half as one real matmul.
    tail:   (..., fft_length/2) complex64 carry.

    Returns (y, new_tail) where y has x's shape: the band-pass-filtered stream,
    bit-equivalent (to f32 tolerance) to the reference per-block chain.
    """
    fft_length = w_real.shape[1]
    block = fft_length // 2
    frames = frame_overlap_save(x, tail, block)  # (..., nb, 2*block)
    xr = jnp.concatenate([frames.real, frames.imag], axis=-1)  # (..., nb, 2*fft)
    y = jnp.matmul(xr, w_real, precision=precision)  # (..., nb, fft)
    yc = jax.lax.complex(y[..., :block], y[..., block:])
    new_tail = x[..., -block:]
    return yc.reshape(x.shape), new_tail


def overlap_save_filter_fft(
    x: jax.Array,
    mask: jax.Array,
    tail: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Reference-math path: batched FFT -> mask multiply -> iFFT -> right half.

    Matches RDSP_convolutional.h:291-318 exactly (CMSIS forward cfft is
    unscaled; the inverse applies 1/N, same as jnp.fft.ifft).
    """
    fft_length = mask.shape[-1]
    block = fft_length // 2
    frames = frame_overlap_save(x, tail, block)
    spec = jnp.fft.fft(frames, axis=-1)
    filt = jnp.fft.ifft(spec * mask, axis=-1)
    y = filt[..., block:]
    new_tail = x[..., -block:]
    return y.reshape(x.shape), new_tail
