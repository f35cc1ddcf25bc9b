"""Planar-complex (split re/im f32) implementations of the hot-path ops.

TPU-native layout decision: complex64 is a *host boundary* type only. On
device, IQ streams are pairs of f32 planes — the layout the VPU lanes and MXU
want, and the only one this TPU runtime executes (complex-typed programs are
UNIMPLEMENTED at run time on the deployment backend; they also lower poorly on
TPU generally). The complex-typed ops in fastconv/nco/demod remain as thin
wrappers used by CPU tests and oracles; the production chain
(models/receiver.rx_chain) is built on these planar kernels.

Each function mirrors its complex counterpart exactly (same math, same
citations — see ops/fastconv.py, ops/nco.py, ops/demod.py, ops/spectral_sub.py)
and is tested for equality against it on CPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from radiodsp_sdr_rx_tpu.ops.iir import dc_blocker

_PHASE_SCALE = np.float32(2.0 * np.pi / 4294967296.0)


# ---------------- NCO ----------------

def nco_mix_planar(
    xr: jax.Array, xi: jax.Array, phase0, phase_inc
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Quadrature DDC mix-down, planar. See ops/nco.nco_mix.

    Phase math in wrap-around int32 (bit-identical to the uint32 DDS word;
    cos/sin are 2*pi-periodic so the signed view is exact).
    Returns (yr, yi, next_phase0) with next_phase0 uint32.
    """
    n = xr.shape[-1]
    inc_u = jnp.asarray(phase_inc, jnp.uint32)
    ph_u = jnp.asarray(phase0, jnp.uint32)
    inc = jax.lax.bitcast_convert_type(inc_u, jnp.int32)
    ph = jax.lax.bitcast_convert_type(ph_u, jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    ang = (ph + j * inc).astype(jnp.float32) * _PHASE_SCALE
    c, s = jnp.cos(ang), jnp.sin(ang)
    # (xr + j xi) * (c - j s)
    yr = xr * c + xi * s
    yi = xi * c - xr * s
    return yr, yi, ph_u + jnp.asarray(n, jnp.uint32) * inc_u


# ---------------- overlap-save filtering ----------------

def frame_planar(x: jax.Array, tail: jax.Array, block: int = 128) -> jax.Array:
    """(..., n) f32 + (..., block) tail -> (..., n/block, 2*block) frames."""
    n = x.shape[-1]
    nb = n // block
    padded = jnp.concatenate([tail, x], axis=-1)
    blocks = padded.reshape(*x.shape[:-1], nb + 1, block)
    return jnp.concatenate([blocks[..., :-1, :], blocks[..., 1:, :]], axis=-1)


def overlap_save_filter_planar(
    xr: jax.Array,
    xi: jax.Array,
    w: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Planar overlap-save via the collapsed MXU operator (fir_design).

    w: (2F, F) from overlap_save_matrix_real. Returns (yr, yi, new_tail_r,
    new_tail_i). Same math as fastconv.overlap_save_filter.
    """
    fft_length = w.shape[1]
    block = fft_length // 2
    fr = frame_planar(xr, tail_r, block)
    fi = frame_planar(xi, tail_i, block)
    x2 = jnp.concatenate([fr, fi], axis=-1)          # (..., nb, 2F)
    y = jnp.matmul(x2, w, precision=precision)       # (..., nb, F)
    yr = y[..., :block].reshape(xr.shape)
    yi = y[..., block:].reshape(xr.shape)
    return yr, yi, xr[..., -block:], xi[..., -block:]


def ssb_filter_demod_planar(
    xr: jax.Array,
    xi: jax.Array,
    w_ssb: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Sideband filter + SSB demod fused into one half-width matmul.

    w_ssb: (2F, F/2) from pallas_kernels.ssb_demod_operator — computes
    2*Re(filtered) directly (the imaginary plane is never needed for SSB).
    Returns (audio, new_tail_r, new_tail_i).
    """
    fft_length = w_ssb.shape[0] // 2
    block = fft_length // 2
    fr = frame_planar(xr, tail_r, block)
    fi = frame_planar(xi, tail_i, block)
    x2 = jnp.concatenate([fr, fi], axis=-1)
    audio = jnp.matmul(x2, w_ssb, precision=precision)
    return audio.reshape(xr.shape), xr[..., -block:], xi[..., -block:]


def pbt_filter_planar(
    audio: jax.Array,
    w_pbt: jax.Array,
    tail: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The reference conv-engine PBT stage (z = a + ja), planar.

    w_pbt: (F, F) from pallas_kernels.pbt_operator -> [L | R].
    Returns (L, R, new_tail).
    """
    fft_length = w_pbt.shape[0]
    block = fft_length // 2
    f = frame_planar(audio, tail, block)
    y = jnp.matmul(f, w_pbt, precision=precision)    # (..., nb, F) = [L|R]
    l = y[..., :block].reshape(audio.shape)
    r = y[..., block:].reshape(audio.shape)
    return l, r, audio[..., -block:]


# ---------------- demodulators ----------------

def demod_am_planar(
    zr: jax.Array, zi: jax.Array, dc_state: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """AM envelope |z| - DC (ops/demod.demod_am)."""
    env = jnp.sqrt(zr * zr + zi * zi)
    return dc_blocker(env, dc_state)


class SAMStatePlanar(NamedTuple):
    phase: jax.Array
    freq: jax.Array
    dc: jax.Array


def sam_init_planar() -> SAMStatePlanar:
    return SAMStatePlanar(phase=np.float32(0.0), freq=np.float32(0.0),
                          dc=np.zeros(2, np.float32))


def demod_sam_planar(
    zr: jax.Array,
    zi: jax.Array,
    state: SAMStatePlanar,
    bw_hz: float = 100.0,
    sample_rate: float = 44117.64706,
) -> tuple[jax.Array, SAMStatePlanar]:
    """Synchronous AM PLL, planar scan (ops/demod.demod_sam)."""
    wn = 2.0 * np.pi * bw_hz / sample_rate
    zeta = 0.70710678
    kp = jnp.float32(2.0 * zeta * wn)
    ki = jnp.float32(wn * wn)
    max_freq = jnp.float32(2.0 * np.pi * 2000.0 / sample_rate)

    def step(carry, zn):
        phase, freq = carry
        znr, zni = zn
        cr, ci = jnp.cos(phase), jnp.sin(phase)
        # v = z * conj(ref)
        vr = znr * cr + zni * ci
        vi = zni * cr - znr * ci
        err = jnp.arctan2(vi, vr)
        freq = jnp.clip(freq + ki * err, -max_freq, max_freq)
        phase = jnp.mod(phase + freq + kp * err, 2.0 * np.pi)
        return (phase, freq), vr

    (phase, freq), audio = jax.lax.scan(
        step, (jnp.float32(state.phase), jnp.float32(state.freq)), (zr, zi)
    )
    audio, dc = dc_blocker(audio, state.dc)
    return audio, SAMStatePlanar(phase=phase, freq=freq, dc=dc)


# ---------------- preprocessor / noise blanker ----------------

def iq_gain_balance_planar(
    xr: jax.Array, xi: jax.Array, gain
) -> tuple[jax.Array, jax.Array]:
    return xr, xi * gain


def noise_blanker_planar(
    xr: jax.Array,
    xi: jax.Array,
    avg0: jax.Array,
    threshold_db: float = 10.0,
    tau_samples: float = 512.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Impulse blanker (ops/noise_blanker.noise_blanker), planar.
    tau_samples may be a traced scalar (ReceiverConfig.nb_tau_samples)."""
    from radiodsp_sdr_rx_tpu.ops.iir import first_order_iir

    mag = jnp.sqrt(xr * xr + xi * xi)
    a = jnp.exp(-1.0 / jnp.asarray(tau_samples, jnp.float32))
    avg, avg_last = first_order_iir(mag, a, 1.0 - a, avg0)
    thresh = 10.0 ** (threshold_db / 20.0)
    keep = mag <= (avg * thresh + 1e-12)
    zero = jnp.zeros_like(xr)
    return jnp.where(keep, xr, zero), jnp.where(keep, xi, zero), avg_last


# ---------------- spectral subtraction (DFT-as-matmul, no complex FFT) ------

def dft_matrices(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, n) f32 cos/sin DFT matrices: S = x @ (C - jS) == FFT(x) for the
    planar pipeline (built once on host in float64)."""
    k = np.arange(n)
    w = 2.0 * np.pi * np.outer(k, k) / n
    return np.cos(w).astype(np.float32), np.sin(w).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _split_dft_consts(n: int):
    """Host-built f32 constants for a radix-2 DIT split of the n-point DFT:
    half-size cos/sin matrices + first-level twiddles (f64 math)."""
    m = n // 2
    k = np.arange(m)
    w = 2.0 * np.pi * np.outer(k, k) / m
    tw = 2.0 * np.pi * k / n
    return (np.cos(w).astype(np.float32), np.sin(w).astype(np.float32),
            np.cos(tw).astype(np.float32), np.sin(tw).astype(np.float32))


def planar_dft_split(xr: jax.Array, xi: jax.Array, n: int,
                     precision=jax.lax.Precision.HIGHEST):
    """n-point DFT of planar complex frames (..., n) via one radix-2
    decimation-in-time level: two (n/2)^2 matmuls instead of one n^2 —
    half the MXU flops, with the (n/2)-point sub-DFTs still 128-wide
    (MXU-native for the reference's n=256). Exact same math as
    X = (xr + j xi) @ (C_n - j S_n); rounding differs at the f32 ulp level.
    """
    c2, s2, twc, tws = _split_dft_consts(n)
    m = n // 2
    x2r = xr.reshape(*xr.shape[:-1], m, 2)
    x2i = xi.reshape(*xi.shape[:-1], m, 2)
    er_, ei_ = x2r[..., 0], x2i[..., 0]          # even samples
    or_, oi_ = x2r[..., 1], x2i[..., 1]          # odd samples
    mm = functools.partial(jnp.matmul, precision=precision)
    e_r = mm(er_, c2) + mm(ei_, s2)
    e_i = mm(ei_, c2) - mm(er_, s2)
    o_r = mm(or_, c2) + mm(oi_, s2)
    o_i = mm(oi_, c2) - mm(or_, s2)
    # twiddle W_n^k = e^{-2pi j k / n}
    t_r = twc * o_r + tws * o_i
    t_i = twc * o_i - tws * o_r
    return (jnp.concatenate([e_r + t_r, e_r - t_r], axis=-1),
            jnp.concatenate([e_i + t_i, e_i - t_i], axis=-1))


def spectral_subtract_planar(
    l: jax.Array,
    r: jax.Array,
    nr_level,
    nfloor0: jax.Array,
    dft_cos: jax.Array,
    dft_sin: jax.Array,
    tail_l: jax.Array,
    tail_r: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    split_dft: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """The backup engine's spectral subtraction (ops/spectral_sub) with the
    FFTs as planar DFT matmuls on the MXU (z = L + jR per the reference frame
    layout). Returns (L', R', nfloor_last, new_tail_l, new_tail_r).

    split_dft=True runs both transforms through one radix-2 DIT level
    (planar_dft_split — half the MXU flops; the dft_cos/dft_sin operands are
    then only used for their static size). False keeps the direct n^2 form.
    """
    from radiodsp_sdr_rx_tpu.ops.spectral_sub import (
        FLOOR_BETA, UNDER_FLOOR_GAIN, VAD_END_BIN, VAD_START_BIN,
    )

    n = dft_cos.shape[0]
    block = n // 2
    fl = frame_planar(l, tail_l, block)          # (..., nb, n)
    fr_ = frame_planar(r, tail_r, block)
    # forward DFT: spec = (fl + j fr) @ (C - jS)
    if split_dft:
        sr, si = planar_dft_split(fl, fr_, n, precision)
    else:
        sr = jnp.matmul(fl, dft_cos, precision=precision) + jnp.matmul(
            fr_, dft_sin, precision=precision)
        si = jnp.matmul(fr_, dft_cos, precision=precision) - jnp.matmul(
            fl, dft_sin, precision=precision)
    mag = jnp.sqrt(sr * sr + si * si)

    band = mag[..., VAD_START_BIN : VAD_END_BIN + 1]
    floor_est = jnp.sum(band, axis=-1) / (VAD_END_BIN - VAD_START_BIN)
    floor_est = floor_est * (jnp.asarray(nr_level, jnp.float32) * 1.5)

    a = 1.0 - FLOOR_BETA

    def combine(p, q):
        a1, b1 = p
        a2, b2 = q
        return a1 * a2, b1 * a2 + b2

    av = jnp.full_like(floor_est, a)
    bv = FLOOR_BETA * floor_est
    bv = bv.at[..., 0].add(a * nfloor0)
    _, nfloor = jax.lax.associative_scan(combine, (av, bv), axis=-1)
    nfloor = jnp.maximum(nfloor, 0.0)

    nf = nfloor[..., None]
    scale = jnp.where(mag <= nf, UNDER_FLOOR_GAIN,
                      1.0 - nf / jnp.maximum(mag, 1e-20))
    # subtracted magnitude with original phase == scaling the complex bin
    sr2, si2 = sr * scale, si * scale
    # inverse DFT (1/n scaling): y = (sr2 + j si2) @ (C + jS) / n
    #                              = conj(DFT(conj(spec))) / n
    if split_dft:
        ar, ai = planar_dft_split(sr2, -si2, n, precision)
        yl = ar * (1.0 / n)
        yr = -ai * (1.0 / n)
    else:
        yl = (jnp.matmul(sr2, dft_cos, precision=precision)
              - jnp.matmul(si2, dft_sin, precision=precision)) * (1.0 / n)
        yr = (jnp.matmul(si2, dft_cos, precision=precision)
              + jnp.matmul(sr2, dft_sin, precision=precision)) * (1.0 / n)
    out_l = yl[..., block:].reshape(l.shape)
    out_r = yr[..., block:].reshape(r.shape)
    return out_l, out_r, nfloor[..., -1], l[..., -block:], r[..., -block:]


def inline_denoise_planar(
    xr: jax.Array,
    xi: jax.Array,
    dft_cos: jax.Array,
    dft_sin: jax.Array,
    tail_r: jax.Array,
    tail_i: jax.Array,
    precision=jax.lax.Precision.HIGHEST,
    split_dft: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """The backup sketch's *inline* pre-demod spectral denoise
    (``doConvolutionalProcessing_Denoise``,
    ref: src/backup/RadioDSP_SDR_RX_Conv.ino:1520-1650): per overlap-save
    frame of the complex IQ stream (re = L, im = R, :1576-1580),

        th   = (sum mag[60..120]) / 60 * 3          (:1591-1597 — 61 bins
               summed but divided by 60, replicated)
        mag' = mag <= th ? mag * 0.2 : mag - th     (:1601-1610)

    resynthesized with the original phase (:1613-1628), iFFT, right half out
    (:1643-1647); the FIR mask multiply is commented out in this path
    (:1633). The threshold has NO temporal carry: ``loop()`` reseeds
    TH_VALUE = 0.8 before every call (:1346-1351), so the seed gate
    ``TH_VALUE > 0`` always passes and each frame's threshold is purely its
    own band mean — the cross-frame latch in the source is dead code.

    Returns (xr', xi', new_tail_r, new_tail_i).
    """
    from radiodsp_sdr_rx_tpu.ops.spectral_sub import (
        INLINE_END_BIN, INLINE_MULT, INLINE_START_BIN, UNDER_FLOOR_GAIN,
    )

    n = dft_cos.shape[0]
    block = n // 2
    fl = frame_planar(xr, tail_r, block)          # (..., nb, n)
    fr_ = frame_planar(xi, tail_i, block)
    if split_dft:
        sr, si = planar_dft_split(fl, fr_, n, precision)
    else:
        sr = jnp.matmul(fl, dft_cos, precision=precision) + jnp.matmul(
            fr_, dft_sin, precision=precision)
        si = jnp.matmul(fr_, dft_cos, precision=precision) - jnp.matmul(
            fl, dft_sin, precision=precision)
    mag = jnp.sqrt(sr * sr + si * si)

    band = mag[..., INLINE_START_BIN : INLINE_END_BIN + 1]
    th = (jnp.sum(band, axis=-1)
          / (INLINE_END_BIN - INLINE_START_BIN)) * INLINE_MULT
    thb = th[..., None]
    scale = jnp.where(mag <= thb, UNDER_FLOOR_GAIN,
                      1.0 - thb / jnp.maximum(mag, 1e-20))
    sr2, si2 = sr * scale, si * scale
    if split_dft:
        ar, ai = planar_dft_split(sr2, -si2, n, precision)
        yl = ar * (1.0 / n)
        yr = -ai * (1.0 / n)
    else:
        yl = (jnp.matmul(sr2, dft_cos, precision=precision)
              - jnp.matmul(si2, dft_sin, precision=precision)) * (1.0 / n)
        yr = (jnp.matmul(si2, dft_cos, precision=precision)
              + jnp.matmul(sr2, dft_sin, precision=precision)) * (1.0 / n)
    out_r = yl[..., block:].reshape(xr.shape)
    out_i = yr[..., block:].reshape(xi.shape)
    return out_r, out_i, xr[..., -block:], xi[..., -block:]
