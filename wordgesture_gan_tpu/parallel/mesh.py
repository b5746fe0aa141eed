"""Device mesh and sharding helpers.

The framework's parallelism model (replacing the reference's single hardcoded
CUDA device, src/gan/trainer.py:37): a 1-D ``data`` mesh axis over all local
devices. Train steps are ``jax.jit``-compiled with NamedSharding annotations —
batches sharded over ``data``, parameters replicated — and XLA inserts the
gradient all-reduce over ICI. The mesh is general: extra axes (e.g. ``model``)
can be added without touching the step code.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data_axis_size: int = -1,
    axis_names: Tuple[str, ...] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """1-D data-parallel mesh over local devices (or an explicit device list)."""
    devs = list(devices) if devices is not None else jax.devices()
    if data_axis_size == -1:
        data_axis_size = len(devs)
    devs = devs[:data_axis_size]
    return Mesh(np.array(devs).reshape(len(devs)), axis_names=axis_names)


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the given positional axis over ``data``; replicate the rest."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, batch_axis: int = 0):
    """Device-put a host pytree of batch arrays with the batch axis sharded
    over the ``data`` mesh axis. One device_put call for the whole tree so
    transfers batch (important through a remote-TPU tunnel)."""
    sharding = batch_sharding(mesh, batch_axis)
    return jax.device_put(tree, jax.tree.map(lambda _: sharding, tree))


def replicate(mesh: Mesh, tree):
    """Device-put a host pytree fully replicated over the mesh (single
    batched transfer)."""
    sharding = replicated(mesh)
    return jax.device_put(tree, jax.tree.map(lambda _: sharding, tree))
