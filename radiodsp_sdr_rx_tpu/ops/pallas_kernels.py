"""Pallas TPU kernels: the fused hot path of the receive chain.

The XLA chain materializes every stage to HBM (~60 B/sample); these kernels
compute a whole time-block pipeline in VMEM and ride the MXU for the collapsed
overlap-save operators (see fir_design.overlap_save_matrix):

  fused_mix_filter_demod — NCO mix (int32 DDS phases computed in-kernel from
      the grid position) -> overlap-save framing -> sideband band-pass + SSB
      demod as ONE real matmul (nb,512)@(512,128) -> audio.

  pbt_filter — the reference conv-engine stage (z = L + jR with L = R,
      RDSP_convolutional.h:228-318) as one matmul (nb,256)@(256,256) producing
      [L|R].

Framing note: each 256-sample frame needs the previous 128 samples. Rather
than carrying a VMEM tail across sequential grid steps (this Pallas build
rejects the @pl.when + scratch-carry pattern), the wrapper passes a
one-block-shifted *view* of the stream (built by XLA concat — one extra
8 B/sample read) and the kernel mixes both views with phase offsets computed
from the absolute position. Kernels are stateless; streaming correctness comes
from the shifted view's tail argument. HBM per sample: 16 B read + 4 B write
for the fused stage vs ~60 B for the unfused chain.

FLOP note: producing only the needed real outputs halves the arithmetic vs
the generic complex operator (the imaginary part of the SSB path is never
demanded). Operators are built host-side in float64 by ssb_demod_operator /
pbt_operator below.

Phase note: wrap-around int32 arithmetic is bit-identical to the uint32 DDS
accumulator (two's complement) and cos/sin are 2*pi-periodic, so the signed
phase word is exact — and Mosaic supports int32 -> f32 casts (uint32 is not).

Semantics: equal (to f32 tolerance) to the unfused ops — tests compare against
the XLA chain. AGC stays outside (between the two stages) to preserve the
reference's order; it is scan-free (ops/agc.py) and cheap.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiodsp_sdr_rx_tpu.ops.fir_design import overlap_save_matrix

_PHASE_SCALE = np.float32(2.0 * np.pi / 4294967296.0)


def ssb_demod_operator(mask: np.ndarray, gain: float = 2.0) -> np.ndarray:
    """(512, 128) f32: [frames_re | frames_im] @ W == gain*Re(A @ frame).

    A is the collapsed overlap-save operator of ``mask``; gain=2 restores the
    SSB amplitude (ops/demod.demod_ssb).
    """
    a = overlap_save_matrix(mask)  # (128, 256) complex
    w_top = gain * a.real.T        # frames_re @ (256,128)
    w_bot = -gain * a.imag.T       # frames_im @ (256,128)
    return np.concatenate([w_top, w_bot], axis=0).astype(np.float32)


def pbt_operator(mask: np.ndarray) -> np.ndarray:
    """(256, 256) f32: audio_frames @ W == [L | R] of the reference PBT stage.

    With z = a(1+j): L = Re(A z) = a @ (Ar - Ai).T, R = Im(A z) = a @ (Ar + Ai).T.
    """
    a = overlap_save_matrix(mask)
    w_l = (a.real - a.imag).T      # (256, 128)
    w_r = (a.real + a.imag).T
    return np.concatenate([w_l, w_r], axis=1).astype(np.float32)


def _shift_one_block(x: jax.Array, tail: jax.Array) -> jax.Array:
    """(C, n) -> (C, n) shifted right by 128 samples; ``tail`` fills the head
    (the stream carry — zeros at stream start, the previous segment's last
    block when streaming)."""
    return jnp.concatenate([tail, x[..., :-128]], axis=-1)


def _mix_demod_kernel(
    inc_ref, phase0_ref, xr_ref, xi_ref, pr_ref, pi_ref, w_ref, audio_ref,
    *, nb: int, out_gain: float,
):
    """One (channel-block, time-block) grid step. Blocks are (cb, nb, 128)."""
    t_idx = pl.program_id(1)
    cb = xr_ref.shape[0]

    # DDS phases: phase0 + (t0 + j) * inc in wrap-around int32
    blk = jax.lax.broadcasted_iota(jnp.int32, (cb, nb, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cb, nb, 128), 2)
    j = blk * 128 + lane
    t0 = t_idx * (nb * 128)
    inc = inc_ref[:][:, :, None]          # (cb, 1, 1) int32 phase word
    phase = phase0_ref[:][:, :, None] + (t0 + j) * inc
    ang = phase.astype(jnp.float32) * _PHASE_SCALE
    c, s = jnp.cos(ang), jnp.sin(ang)
    # previous-half phases: 128 samples earlier
    ang_p = (phase - 128 * inc).astype(jnp.float32) * _PHASE_SCALE
    cp, sp = jnp.cos(ang_p), jnp.sin(ang_p)

    # mix down both views: (x + j y) * (cos - j sin)
    br = xr_ref[:] * c + xi_ref[:] * s    # (cb, nb, 128) current half
    bi = xi_ref[:] * c - xr_ref[:] * s
    ar = pr_ref[:] * cp + pi_ref[:] * sp  # previous half
    ai = pi_ref[:] * cp - pr_ref[:] * sp

    frames = jnp.concatenate([ar, br, ai, bi], axis=-1)  # (cb, nb, 512)
    y = jax.lax.dot_general(
        frames.reshape(cb * nb, 512), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (cb*nb, 128)
    audio_ref[:] = y.reshape(cb, nb, 128) * out_gain


def fused_mix_filter_demod(
    xr: jax.Array,
    xi: jax.Array,
    inc: jax.Array,
    phase0: jax.Array,
    w: jax.Array,
    tail: jax.Array | None = None,
    out_gain: float = 1.0,
    block_c: int = 8,
    block_t: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Fused NCO mix + sideband filter + SSB demod.

    xr, xi: (C, n) f32 planar IQ; inc, phase0: (C,) uint32; w: (512, 128) f32
    from ssb_demod_operator; tail: (C, 128) complex-planar pair packed as
    f32 (C, 256) [re|im] or None for stream start. C % block_c == 0,
    n % block_t == 0. Returns audio (C, n) f32 (pre-AGC).
    """
    inc = jax.lax.bitcast_convert_type(jnp.asarray(inc, jnp.uint32), jnp.int32)
    phase0 = jax.lax.bitcast_convert_type(jnp.asarray(phase0, jnp.uint32), jnp.int32)
    c, n = xr.shape
    nb = block_t // 128
    grid = (c // block_c, n // block_t)
    if tail is None:
        tail_r = jnp.zeros((c, 128), xr.dtype)
        tail_i = jnp.zeros((c, 128), xr.dtype)
    else:
        tail_r, tail_i = tail[..., :128], tail[..., 128:]
    pr = _shift_one_block(xr, tail_r).reshape(c, n // 128, 128)
    pi = _shift_one_block(xi, tail_i).reshape(c, n // 128, 128)
    x3r = xr.reshape(c, n // 128, 128)
    x3i = xi.reshape(c, n // 128, 128)
    kernel = functools.partial(_mix_demod_kernel, nb=nb, out_gain=out_gain)

    def spec3(ci_ti_to=lambda ci, ti: (ci, ti, 0)):
        return pl.BlockSpec((block_c, nb, 128), ci_ti_to,
                            memory_space=pltpu.VMEM)

    audio = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_c, 1), lambda ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1), lambda ci, ti: (ci, 0),
                         memory_space=pltpu.VMEM),
            spec3(), spec3(), spec3(), spec3(),
            pl.BlockSpec((512, 128), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec3(),
        out_shape=jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
        interpret=interpret,
    )(inc[:, None], phase0[:, None], x3r, x3i, pr, pi, w)
    return audio.reshape(c, n)


def _pbt_kernel(a_ref, p_ref, w_ref, l_ref, r_ref, *, nb: int):
    cb = a_ref.shape[0]
    frames = jnp.concatenate([p_ref[:], a_ref[:]], axis=-1)  # (cb, nb, 256)
    y = jax.lax.dot_general(
        frames.reshape(cb * nb, 256), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(cb, nb, 256)                # [L | R]
    l_ref[:] = y[:, :, :128]
    r_ref[:] = y[:, :, 128:]


def pbt_filter(
    audio: jax.Array,
    w: jax.Array,
    tail: jax.Array | None = None,
    block_c: int = 8,
    block_t: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Reference PBT conv stage: audio (C, n) f32 -> (L, R) each (C, n).

    w: (256, 256) from pbt_operator; tail: (C, 128) previous segment's last
    audio block (None = stream start).
    """
    c, n = audio.shape
    nb = block_t // 128
    grid = (c // block_c, n // block_t)
    if tail is None:
        tail = jnp.zeros((c, 128), audio.dtype)
    prev = _shift_one_block(audio, tail).reshape(c, n // 128, 128)
    a3 = audio.reshape(c, n // 128, 128)
    kernel = functools.partial(_pbt_kernel, nb=nb)

    def spec3():
        return pl.BlockSpec((block_c, nb, 128), lambda ci, ti: (ci, ti, 0),
                            memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
    ]
    l, r = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec3(), spec3(),
            pl.BlockSpec((256, 256), lambda ci, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[spec3(), spec3()],
        out_shape=out_shape,
        interpret=interpret,
    )(a3, prev, w)
    return l.reshape(c, n), r.reshape(c, n)
