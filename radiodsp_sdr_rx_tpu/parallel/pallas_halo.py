"""Fused ICI ring-halo exchange as a Pallas remote-DMA kernel.

SURVEY.md §2.3 names ``pltpu.make_async_remote_copy`` as the fused
ring-communication primitive for the overlap-save halo (the reference's
one-block carry, RDSP_convolutional.h:256-285, turned into ring/context
parallelism over the time axis). ``parallel/stream_shard._shift_from_left``
implements the same exchange with ``jax.lax.ppermute`` (an XLA collective);
this module is the Pallas counterpart: each device RDMAs its boundary block
directly into its right neighbor's VMEM over ICI, inside a kernel, with a
neighborhood barrier — the building block for fusing the halo into compute
kernels (the sweep chain prologue) instead of staging it through HBM between
XLA collectives.

Validated on the virtual 8-device CPU mesh via the Mosaic interpreter
(``pltpu.InterpretParams`` simulates remote DMAs, semaphores and the barrier,
with race detection on) against the ppermute path — see
tests/test_parallel.py. On real hardware it compiles natively (single-chip
tiles can't exercise it; the driver's multichip dryrun covers the virtual
path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# distinct collective_id per logical barrier user (must not collide with other
# collective Pallas kernels launched in the same program)
_HALO_COLLECTIVE_ID = 7


def _halo_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis_name: str):
    """Send our block to the RIGHT ring neighbor; receive from the LEFT.

    The neighborhood barrier makes the buffer lifetime safe: a device may not
    start its RDMA until both neighbors have entered the kernel (otherwise a
    fast sender could land bytes in a VMEM buffer the receiver has not
    allocated/entered yet — the canonical ring pattern)."""
    my = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    right = jax.lax.rem(my + 1, n)
    left = jax.lax.rem(my + n - 1, n)

    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                           device_id_type=pltpu.DeviceIdType.LOGICAL)
    pltpu.semaphore_wait(barrier, 2)

    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=out_ref,
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rdma.start()
    rdma.wait()


def ring_shift_right_pallas(
    x: jax.Array, axis_name: str, interpret: bool | None = None
) -> jax.Array:
    """Ring-shift a local f32 block one device to the RIGHT over ICI.

    x: (..., lanes) f32 local block (2-D minimum for VMEM tiling). Must be
    called inside ``shard_map`` over ``axis_name``. Returns the block received
    from the LEFT neighbor (device 0 receives device n-1's block — callers
    that need stream-start semantics overwrite device 0, as
    ``shift_from_left_pallas`` does).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    kernel = functools.partial(_halo_kernel, axis_name=axis_name)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # NOTE: callers' shard_map must pass check_vma=False — the kernel's
        # output varies across the ring axis in a way the vma checker cannot
        # express for pallas_call yet
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            collective_id=_HALO_COLLECTIVE_ID),
        interpret=pltpu.InterpretParams(detect_races=True) if interpret
        else False,
    )(x)


def shift_from_left_pallas(
    tail: jax.Array, axis_name: str, first_tail: jax.Array,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in Pallas-RDMA replacement for stream_shard._shift_from_left.

    tail/first_tail: (..., half) f32 or complex64 (complex is split into two
    f32 planes around the kernel — complex never enters device code).
    Every device receives its LEFT neighbor's tail; device 0 receives
    ``first_tail`` (the stream-start carry).
    """
    idx = jax.lax.axis_index(axis_name)
    if jnp.iscomplexobj(tail):
        planes = jnp.stack([jnp.real(tail), jnp.imag(tail)], axis=0)
        flat = planes.reshape(-1, tail.shape[-1])
        got = ring_shift_right_pallas(flat, axis_name, interpret)
        got = got.reshape(planes.shape)
        received = jax.lax.complex(got[0], got[1])
    else:
        x2 = tail.reshape(-1, tail.shape[-1])
        received = ring_shift_right_pallas(x2, axis_name, interpret
                                           ).reshape(tail.shape)
    return jnp.where(idx == 0, first_tail, received)
