"""SPMD scaling over TPU meshes: sharded rendering + gradient all-reduce.

The reference is single-process/single-GPU (SURVEY.md §2.3); this module adds
the data-parallel dimension the TPU build needs: the ray/pixel batch is
sharded over a 1-D ``rays`` mesh axis via ``shard_map``, voxel-grid params
are replicated, and per-shard gradient grids are combined with ``pmean``
over ICI.  Per-shard RNG decorrelation is by seed mixing (TEA of the global
seed with the shard index), preserving the PRB replay discipline within each
shard.

Multi-host usage: call :func:`initialize_distributed` first (JAX
``jax.distributed.initialize``), then build the mesh over all devices; XLA
routes the psum over ICI within hosts and DCN across hosts.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.rng import sample_tea_32


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (no-op on a single process)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def sharded_loss_and_grad(mesh: Mesh, render: Callable, loss: Callable,
                          axis: str = "rays"):
    """Build a sharded value-and-grad of ``loss(render(...), ref)``.

    ``render(params, emitter, cameras, sensor_idx, pixels, seed, seed_grad)``
    is the custom-VJP batched render; the batch (sensor_idx, pixels, ref) is
    sharded over ``axis``; params/emitter/cameras replicated; the returned
    loss and grads are global (pmean-reduced).
    """

    # check_vma=False: the per-shard render is independent math (collectives
    # appear only in the final pmean), and the pallas engine's
    # ``pallas_call`` out_shapes carry no varying-mesh-axes annotation —
    # with the checker on, shard_map rejects the kernel outright
    # (tests/test_parallel.py::test_sharded_pallas_engine_interpret).
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(), P()),
             out_specs=(P(), P()), check_vma=False)
    def vag(params, emitter, cameras, sensor_idx, pixels, ref,
            seed, seed_grad):
        shard = jax.lax.axis_index(axis).astype(jnp.uint32)
        local_seed, _ = sample_tea_32(seed, shard * 2 + 1)
        local_seed_grad, _ = sample_tea_32(seed_grad, shard * 2 + 2)

        def f(p):
            img = render(p, emitter, cameras, sensor_idx, pixels,
                         local_seed, local_seed_grad)
            return loss(img, ref)

        l, g = jax.value_and_grad(f)(params)
        l = jax.lax.pmean(l, axis)
        g = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, axis), g)
        return l, g

    return vag


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated on every device of the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_batch(mesh: Mesh, tree, axis: str = "rays"):
    """Place batch arrays sharded along their leading dim."""
    def put(x):
        spec = P(axis) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree)
