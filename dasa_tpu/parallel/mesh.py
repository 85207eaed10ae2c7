"""Device mesh and sharding utilities.

Replaces the reference's NCCL DDP / torch DataParallel plumbing
(tasks/R2R/parallel.py, nav_dic_pretrain.py:242-256, distributed.py) with
`jax.sharding`: one mesh, named axes, XLA-inserted collectives.

The listener's scale-out axis is `data` (episodes per chip).  A `model`
axis is reserved in the mesh-construction API so tensor-parallel variants
can shard the BERT/LSTM weight matrices later without touching callers
(the ~200M-param DASA stack does not need TP for parity — SURVEY.md
section 2.5).

Gradient all-reduce needs no explicit psum: parameters are replicated,
batches are sharded over `data`, and GSPMD inserts the cross-replica
reduction inside `jax.grad`'s backward — the custom AllReduce autograd
Function of the reference (parallel.py:96-119) simply disappears.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('data', 'model') axes.  Defaults to all devices on the
    data axis.  On multi-host deployments, pass jax.devices() after
    jax.distributed.initialize(); the data axis spans ICI within a slice
    and DCN across slices in device order."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices)
    grid = np.asarray(devices[: n_data * n_model]).reshape(
        (n_data, n_model))
    return Mesh(grid, ("data", "model"))


def replicate(tree, mesh: Mesh):
    """Replicate every leaf across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(tree, mesh: Mesh, axis: int = 0):
    """Shard each leaf's `axis` over the data axis (leaves whose dim at
    `axis` is not divisible stay replicated)."""

    def put(x):
        x = np.asarray(x) if not hasattr(x, "sharding") else x
        if x.ndim > axis and x.shape[axis] % mesh.shape["data"] == 0:
            spec = [None] * x.ndim
            spec[axis] = "data"
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def shard_stacked(tree, mesh: Mesh):
    """Shard (T, B, ...) per-step stacks over their batch (second) axis."""
    return shard_batch(tree, mesh, axis=1)
