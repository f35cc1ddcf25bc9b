"""Single-sweep fused kernels: manual double-buffered DMA, VMEM tail carry.

The stateless kernels in ops/pallas_kernels.py pay an extra 8 B/sample to read
a one-block-shifted view of the stream (this backend rejects cross-grid-step
scratch carries). These kernels instead put the WHOLE time axis inside one
grid step per channel-block and stream it chunk-by-chunk with explicit
``pltpu.make_async_copy`` double buffering — the framing tail lives in VMEM
scratch across the in-kernel ``fori_loop`` (a pattern this backend does
support). HBM traffic for mix+filter+demod drops to 8 B read + 4 B write per
sample — the design recorded as headroom #1 in docs/PERFORMANCE.md.

Grid: (C/block_c,). Inputs stay in HBM (``pl.ANY``); per-chunk slices are
DMA'd into a 2-slot VMEM ring overlapping compute with the next chunk's load.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PHASE_SCALE = np.float32(2.0 * np.pi / 4294967296.0)


def _sweep_kernel(
    inc_ref, phase0_ref, xr_hbm, xi_hbm, w_ref, out_hbm,
    buf_r, buf_i, buf_o, sem_r, sem_i, sem_o, tail_r, tail_i,
    *, chunk_nb: int, n_chunks: int, out_gain: float,
):
    """One channel-block: stream the full time axis in chunks of
    ``chunk_nb`` 128-sample blocks. Buffers (2, cb, chunk_nb, 128)."""
    cb = buf_r.shape[1]

    def dma_in(slot, t):
        return (
            pltpu.make_async_copy(
                xr_hbm.at[:, pl.ds(t * chunk_nb, chunk_nb)], buf_r.at[slot],
                sem_r.at[slot]),
            pltpu.make_async_copy(
                xi_hbm.at[:, pl.ds(t * chunk_nb, chunk_nb)], buf_i.at[slot],
                sem_i.at[slot]),
        )

    tail_r[:] = jnp.zeros_like(tail_r)
    tail_i[:] = jnp.zeros_like(tail_i)
    d0r, d0i = dma_in(0, 0)
    d0r.start()
    d0i.start()

    inc = inc_ref[:][:, :, None]              # (cb, 1, 1) int32
    ph0 = phase0_ref[:][:, :, None]
    blk = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk_nb, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk_nb, 128), 2)
    j_local = blk * 128 + lane

    def body(t, _):
        slot = t % 2

        @pl.when(t + 1 < n_chunks)
        def _():
            nr, ni = dma_in((t + 1) % 2, t + 1)
            nr.start()
            ni.start()

        cr, ci = dma_in(slot, t)
        cr.wait()
        ci.wait()

        # mix with absolute-position DDS phases (int32 wrap == uint32 DDS)
        phase = ph0 + (t * (chunk_nb * 128) + j_local) * inc
        ang = phase.astype(jnp.float32) * _PHASE_SCALE
        c, s = jnp.cos(ang), jnp.sin(ang)
        xr = buf_r[slot]
        xi = buf_i[slot]
        br = xr * c + xi * s
        bi = xi * c - xr * s

        prev_r = jnp.concatenate([tail_r[:][:, None, :], br[:, :-1, :]], axis=1)
        prev_i = jnp.concatenate([tail_i[:][:, None, :], bi[:, :-1, :]], axis=1)
        frames = jnp.concatenate([prev_r, br, prev_i, bi], axis=-1)
        y = jax.lax.dot_general(
            frames.reshape(cb * chunk_nb, 512), w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(cb, chunk_nb, 128)

        tail_r[:] = br[:, -1, :]
        tail_i[:] = bi[:, -1, :]

        buf_o[slot] = y * out_gain
        d_out = pltpu.make_async_copy(
            buf_o.at[slot], out_hbm.at[:, pl.ds(t * chunk_nb, chunk_nb)],
            sem_o.at[slot])
        d_out.start()
        d_out.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def sweep_mix_filter_demod(
    xr: jax.Array,
    xi: jax.Array,
    inc: jax.Array,
    phase0: jax.Array,
    w: jax.Array,
    out_gain: float = 1.0,
    block_c: int = 8,
    chunk_t: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """Single-sweep fused NCO mix + sideband filter + SSB demod.

    xr, xi: (C, n) f32; inc, phase0: (C,) uint32; w: (512, 128)
    (pallas_kernels.ssb_demod_operator). Stream starts with zero tails (use
    the stateless kernels for mid-stream segments, or pre-pend the carry).
    Returns audio (C, n) f32.
    """
    inc = jax.lax.bitcast_convert_type(jnp.asarray(inc, jnp.uint32), jnp.int32)
    phase0 = jax.lax.bitcast_convert_type(jnp.asarray(phase0, jnp.uint32), jnp.int32)
    c, n = xr.shape
    chunk_nb = chunk_t // 128
    n_chunks = n // chunk_t
    x3r = xr.reshape(c, n // 128, 128)
    x3i = xi.reshape(c, n // 128, 128)
    kernel = functools.partial(_sweep_kernel, chunk_nb=chunk_nb,
                               n_chunks=n_chunks, out_gain=out_gain)
    audio = pl.pallas_call(
        kernel,
        grid=(c // block_c,),
        in_specs=[
            pl.BlockSpec((block_c, 1), lambda ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, 1), lambda ci: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, n // 128, 128), lambda ci: (ci, 0, 0),
                         memory_space=pl.ANY),
            pl.BlockSpec((block_c, n // 128, 128), lambda ci: (ci, 0, 0),
                         memory_space=pl.ANY),
            pl.BlockSpec((512, 128), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_c, n // 128, 128), lambda ci: (ci, 0, 0),
                               memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((c, n // 128, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, block_c, chunk_nb, 128), jnp.float32),
            pltpu.VMEM((2, block_c, chunk_nb, 128), jnp.float32),
            pltpu.VMEM((2, block_c, chunk_nb, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((block_c, 128), jnp.float32),
            pltpu.VMEM((block_c, 128), jnp.float32),
        ],
        interpret=interpret,
    )(inc[:, None], phase0[:, None], x3r, x3i, w)
    return audio.reshape(c, n)
