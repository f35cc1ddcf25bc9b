"""Polyphase filter-bank (PFB) channelizer.

Splits a wideband IQ stream into M equally-spaced, M-decimated channels in one
pass — the scalable front end for the many-channel monitoring banks the
reference's single receiver becomes here (BASELINE config 5: 1024 channels).
Cost per input sample is O(taps/M + log M) instead of the bank's O(M) separate
DDCs; on TPU both stages are matmuls:

  1. polyphase filtering: frames (n_out, M*P) of the stream against the
     prototype low-pass reshaped to phases -> one matmul with a (M*P, M)
     block-diagonal-free dense operator? No — the polyphase products reduce
     over P taps per phase, expressed as a strided-frame matmul.
  2. channel separation: an M-point DFT across phases -> (M, M) matmul pair
     (cos/sin), MXU again.

Channel k is centered at k*fs/M (wrapping above fs/2 to negative frequencies)
and emerges at rate fs/M, critically sampled.

Design follows the classic critically-sampled PFB (see PAPERS.md polyphase
references); the prototype is the same windowed-sinc designer used everywhere
else (fir_design), cutoff fs/(2M).

Scope note: critical sampling suits channel-centered signals (AM carriers,
power maps, digital channels). Arbitrary-offset SSB monitoring needs either
wider channels or an oversampled PFB (future work); ReceiverBank covers that
case today at O(M) cost.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops.fir_design import calc_cplx_fir_coeffs
from radiodsp_sdr_rx_tpu.ops.planar import dft_matrices


def design_prototype(n_channels: int, taps_per_phase: int = 8,
                     sample_rate: float = 44117.64706,
                     cutoff_scale: float = 1.0, window_id: int = 1) -> np.ndarray:
    """Real prototype low-pass of length M*P, cutoff fs/(2M)*scale."""
    m, p = n_channels, taps_per_phase
    bw = sample_rate / (2.0 * m) * cutoff_scale
    h = calc_cplx_fir_coeffs(m * p, -bw, bw, sample_rate, window_id).real
    return (h / h.sum()).astype(np.float32)  # unity DC gain


class PFBChannelizer:
    """Critically-sampled polyphase channelizer for planar IQ streams.

    >>> ch = PFBChannelizer(n_channels=64)
    >>> yr, yi, state = ch(xr, xi, state)   # (..., n) -> (..., 64, n//64)
    """

    def __init__(self, n_channels: int, taps_per_phase: int = 8,
                 sample_rate: float = 44117.64706):
        self.m = n_channels
        self.p = taps_per_phase
        proto = design_prototype(n_channels, taps_per_phase, sample_rate)
        # polyphase matrix: phase r gets taps h[r], h[r+M], ... (newest first)
        self.h_poly = proto.reshape(taps_per_phase, n_channels)  # (P, M)
        c, s = dft_matrices(n_channels)
        self.dft_cos = c
        self.dft_sin = s

    def init_state(self, leading: tuple = ()) -> np.ndarray:
        """(..., (P-1)*M) carry of the last prototype-history samples (planar
        pair packed along the last axis: [re | im])."""
        return np.zeros(leading + (2 * (self.p - 1) * self.m,), np.float32)

    def __call__(self, xr: jax.Array, xi: jax.Array, state: jax.Array,
                 precision=jax.lax.Precision.HIGHEST):
        """Channelize. xr, xi: (..., n), n a multiple of M.

        Returns (yr, yi, new_state): (..., M, n/M) per-channel baseband
        streams at rate fs/M; channel k centered at +k*fs/M (k >= M/2 wraps
        negative).
        """
        m, p = self.m, self.p
        n = xr.shape[-1]
        n_out = n // m
        hist = (p - 1) * m
        hr, hi = state[..., :hist], state[..., hist:]

        h_poly = jnp.asarray(self.h_poly)

        def poly(x, h_carry):
            # block view: b[t, r] = padded[t*M + r] — a pure reshape; the
            # polyphase reduction is then P shifted slice-multiply-adds
            # (no gather: overlapping frames would duplicate data 8x and
            # gathers are slow on TPU)
            padded = jnp.concatenate([h_carry, x], axis=-1)   # (..., n + hist)
            b = padded.reshape(*x.shape[:-1], n_out + p - 1, m)
            acc = h_poly[0] * b[..., 0:n_out, :]
            for j in range(1, p):
                acc = acc + h_poly[j] * b[..., j : j + n_out, :]
            return acc                                        # (..., n_out, M)

        vr = poly(xr, hr)
        vi = poly(xi, hi)
        # M-point DFT across phases (complex input): S = (vr + j vi)(C - jS)
        cm = jnp.asarray(self.dft_cos)
        sm = jnp.asarray(self.dft_sin)
        yr = (jnp.matmul(vr, cm, precision=precision)
              + jnp.matmul(vi, sm, precision=precision))
        yi = (jnp.matmul(vi, cm, precision=precision)
              - jnp.matmul(vr, sm, precision=precision))
        # (..., n_out, M) -> (..., M, n_out)
        yr = jnp.moveaxis(yr, -1, -2)
        yi = jnp.moveaxis(yi, -1, -2)
        new_state = jnp.concatenate([xr[..., -hist:], xi[..., -hist:]], axis=-1)
        return yr, yi, new_state


class OversampledPFB:
    """2x-oversampled polyphase channelizer (hop M/2).

    Same M channel centers as PFBChannelizer but each channel emerges at
    2*fs/M — the passband is NOT critically folded, so signals at arbitrary
    offsets inside a channel (SSB voice anywhere in the bin) survive intact
    and can be re-mixed/demodulated downstream. This removes the critical
    PFB's channel-centered restriction (the scope note above).

    Math: output frame t is the M-point DFT of the polyphase sums taken at
    hop H = M/2, times the twiddle e^{-j*pi*k*t} = (-1)^(k*t) (trivial for
    even frames, a sign flip on odd channels for odd frames). Odd output
    frames coincide with the critically-sampled PFB's frames (same windows);
    the even frames are the extra half-hop samples in between.

    Implementation is gather-free: the stream is reshaped into H-sample rows
    and each polyphase tap contributes via shifted row slices; low phases
    (r < H) read even row offsets, high phases odd — two stacked
    slice-multiply-accumulate pyramids and one DFT matmul pair (MXU).
    """

    def __init__(self, n_channels: int, taps_per_phase: int = 8,
                 sample_rate: float = 44117.64706):
        if n_channels % 2:
            raise ValueError("n_channels must be even")
        self.m = n_channels
        self.h = n_channels // 2
        self.p = taps_per_phase
        proto = design_prototype(n_channels, taps_per_phase, sample_rate)
        self.h_poly = proto.reshape(taps_per_phase, n_channels)  # (P, M)
        c, s = dft_matrices(n_channels)
        self.dft_cos = c
        self.dft_sin = s
        # history: P*M - H samples — frame t reads padded[t*H + j*M + r]
        # for j < P, r < M, so the last frame needs P*M - H of lookback
        self.hist = taps_per_phase * n_channels - self.h

    def init_state(self, leading: tuple = ()) -> np.ndarray:
        """(..., 2*hist) planar carry [re | im]."""
        return np.zeros(leading + (2 * self.hist,), np.float32)

    def __call__(self, xr: jax.Array, xi: jax.Array, state: jax.Array,
                 precision=jax.lax.Precision.HIGHEST):
        """Channelize. xr, xi: (..., n), n a multiple of M.

        Returns (yr, yi, new_state) with y: (..., M, 2*n/M) per-channel
        baseband at rate 2*fs/M; channel k centered at +k*fs/M.
        """
        m, p, h = self.m, self.p, self.h
        n = xr.shape[-1]
        if n % m:
            raise ValueError(f"segment length {n} not a multiple of M={m}")
        n_out = 2 * (n // m)          # frames at hop H
        hist = self.hist
        hr, hi = state[..., :hist], state[..., hist:]
        h_poly = jnp.asarray(self.h_poly)

        def poly(x, h_carry):
            padded = jnp.concatenate([h_carry, x], axis=-1)  # (..., n + hist)
            rows = padded.shape[-1] // h                     # n_out + 2P - 1
            b = padded.reshape(*x.shape[:-1], rows, h)
            lo = h_poly[0, :h] * b[..., 0:n_out, :]
            hi_ = h_poly[0, h:] * b[..., 1 : 1 + n_out, :]
            for j in range(1, p):
                lo = lo + h_poly[j, :h] * b[..., 2 * j : 2 * j + n_out, :]
                hi_ = hi_ + h_poly[j, h:] * b[..., 2 * j + 1 : 2 * j + 1 + n_out, :]
            return jnp.concatenate([lo, hi_], axis=-1)       # (..., n_out, M)

        vr = poly(xr, hr)
        vi = poly(xi, hi)
        cm = jnp.asarray(self.dft_cos)
        sm = jnp.asarray(self.dft_sin)
        yr = (jnp.matmul(vr, cm, precision=precision)
              + jnp.matmul(vi, sm, precision=precision))
        yi = (jnp.matmul(vi, cm, precision=precision)
              - jnp.matmul(vr, sm, precision=precision))
        # twiddle (-1)^(k(t+1)): the hop twiddle (-1)^(kt) times the history
        # offset's (-1)^k (hist = PM - H is an odd multiple of H) — together:
        # sign-flip odd channels on EVEN frames. This makes y[k, t] equal
        # mix-by-k*fs/M -> prototype correlation -> sample at t*H exactly.
        t_idx = jnp.arange(n_out)[:, None]
        k_idx = jnp.arange(m)[None, :]
        tw = jnp.where(((t_idx + 1) & 1) * (k_idx & 1) == 1, -1.0, 1.0).astype(yr.dtype)
        yr = yr * tw
        yi = yi * tw
        yr = jnp.moveaxis(yr, -1, -2)
        yi = jnp.moveaxis(yi, -1, -2)
        new_state = jnp.concatenate([xr[..., -hist:], xi[..., -hist:]], axis=-1)
        return yr, yi, new_state
