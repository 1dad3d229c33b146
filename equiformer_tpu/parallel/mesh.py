"""Data-parallel training over a TPU device mesh.

TPU-native replacement for the reference's NCCL DDP
(utils.py:17-69, main_qm9.py:178-179, oc20/trainer/dist_setup.py): a 1-D
``jax.sharding.Mesh`` over the 'dp' axis, per-device graph batches stacked on
a leading device axis, and a ``shard_map``-wrapped train step that psums
gradients and metrics over ICI — XLA's collectives instead of NCCL all-reduce.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
``jax.process_index() == 0`` replaces ``is_master()``.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..graph.batching import GraphsTuple


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def stack_batches(batches: Sequence[GraphsTuple]) -> GraphsTuple:
    """Stack per-device batches on a new leading device axis."""
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *batches)


def shard_batch(batch: GraphsTuple, mesh: Mesh, axis_name: str = "dp") -> GraphsTuple:
    """Device-put a stacked batch with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def make_parallel_train_step(
    train_step: Callable,
    mesh: Mesh,
    axis_name: str = "dp",
    donate: bool = True,
    num_extra_args: int = 0,
) -> Callable:
    """Wrap a single-device ``train_step(state, batch, rng, *extras)`` for SPMD
    DP.  The wrapped step takes (replicated state, stacked batch [D, ...], rng,
    *extras) and returns (replicated state, metrics).  The train_step must have
    been built with ``pmean_axis == axis_name`` so gradients are all-reduced
    before the optimizer update (the DDP contract)."""

    def per_device(state, batch, rng, *extras):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # [1,...] -> [...]
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        new_state, metrics = train_step(state, batch, rng, *extras)
        return new_state, metrics

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()) + (P(),) * num_extra_args,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())
