"""Pallas RDMA ring hop — explicit ICI remote-DMA B-block exchange.

The lax.ppermute ring (parallel/ring.py) lets XLA schedule the block
exchange; this module provides the EXPLICIT inter-chip path the design
docs promise (SNIPPETS [1], BASELINE.md north star): a Pallas kernel that
pushes the local B block to the left ring neighbour with
`pltpu.make_async_remote_copy`, synchronized by a neighbourhood barrier
(guide pattern: Ring Collectives). One hop per ring step; the surrounding
jitted step overlaps the hop with the local product gather exactly as the
ppermute form does.

Status: compiled/validated paths
- trace/lowering is exercised on the virtual CPU mesh by the test suite
  and dryrun (the kernel's control flow is shape-checked end to end);
- EXECUTION needs real multi-chip ICI. Interpret-mode remote DMA measured
  unreliable in round 1 (half the transfers dropped), so `use_rdma="auto"`
  selects the ppermute ring everywhere except a real multi-device TPU
  backend. Flip to use_rdma=True on a pod slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hop_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis: str, D: int):
    my = jax.lax.axis_index(axis)
    left = jax.lax.rem(my + jnp.int32(D) - 1, jnp.int32(D))
    right = jax.lax.rem(my + 1, jnp.int32(D))
    # neighbourhood barrier: both neighbours' out_ref/semaphores must be
    # live before anyone starts writing into them (guide: Local Barrier)
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=left)
    pltpu.semaphore_signal(barrier, inc=1, device_id=right)
    pltpu.semaphore_wait(barrier, 2)
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref,
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=left,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait()


@functools.partial(jax.jit, static_argnames=("axis", "D", "collective_id"))
def ring_hop_rdma(x, *, axis: str, D: int, collective_id: int = 7):
    """One ring step INSIDE shard_map: returns the block received from the
    right neighbour (send left — matches the ppermute ring's
    [(i, i-1 % D)] permutation)."""
    return pl.pallas_call(
        functools.partial(_hop_kernel, axis=axis, D=D),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id),
    )(x)


def rdma_available(mesh) -> bool:
    """use_rdma='auto' gate: real multi-device TPU backend only (remote
    DMA has no reliable interpret-mode simulation)."""
    try:
        devs = list(mesh.devices.flat)
    except AttributeError:
        return False
    return (len(devs) > 1
            and all(d.platform == "tpu" for d in devs)
            and jax.default_backend() == "tpu")
