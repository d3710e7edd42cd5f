"""Device mesh + sharding utilities.

The reference is single-device (train.py:152 picks 'cuda' or 'cpu'; no
torch.distributed anywhere — SURVEY.md §2.6). The TPU-native framework makes
the mesh a first-class component instead: a ``('data', 'model')`` mesh where

  * batch axes shard over ``data`` (DP — gradients all-reduced by XLA over
    ICI when the loss is jitted with sharded inputs),
  * weight matrices may shard over ``model`` (TP — unnecessary at reference
    model scale, but the API supports it so larger denoisers scale without
    code changes).

All collectives are emitted by XLA from sharding annotations; there is no
hand-written communication backend.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "global_shard_batch", "host_local_batch_size"]


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: int = -1, model: int = 1,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Build a 2-D ('data','model') mesh. ``data=-1`` means 'all remaining
    devices'. With one device this degenerates to a 1x1 mesh and every
    sharding below becomes a no-op, so single-chip and multi-chip run the
    same code path."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; replicate the rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array leaf of a pytree with its batch axis sharded over
    'data'. Leaves keep their committed device layout, so jit emits no
    resharding transfers."""
    def _place(x):
        arr = jax.numpy.asarray(x)
        return jax.device_put(arr, data_sharding(mesh, arr.ndim))
    return jax.tree_util.tree_map(_place, batch)


def global_shard_batch(mesh: Mesh, batch):
    """Multi-host-aware batch placement (SURVEY.md §2.6 DP row).

    Single-process: identical to shard_batch. Multi-process: each host
    passes only its process-LOCAL rows (loaded by a BucketBatcher
    constructed with process_index/process_count) and
    ``jax.make_array_from_process_local_data`` assembles the global
    jax.Array across hosts — no host ever materializes another host's
    data, and XLA sees one globally-sharded batch axis."""
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)

    def _place(x):
        arr = np.asarray(x)
        return jax.make_array_from_process_local_data(
            data_sharding(mesh, arr.ndim), arr)
    return jax.tree_util.tree_map(_place, batch)


def host_local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape["data"]
    if global_batch % n_data != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {n_data}")
    pc = jax.process_count()
    if global_batch % pc != 0:
        # the data axis can be smaller than the host count (e.g. TP-heavy
        # meshes): integer division here would silently under-supply the
        # global assembly
        raise ValueError(
            f"global batch {global_batch} not divisible by process "
            f"count {pc}")
    return global_batch // pc
