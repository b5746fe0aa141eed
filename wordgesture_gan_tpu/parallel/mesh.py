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


def global_replicate(mesh: Mesh, tree):
    """Replicate a host pytree over a mesh that may span processes.

    Single-process: packed_replicate (one transfer per dtype). Multi-process
    (`jax.process_count() > 1`): ``jax.device_put`` cannot address other
    hosts' devices, so each process contributes its own identical host copy
    as the local shard of a fully-replicated global array
    (``jax.make_array_from_process_local_data``). Every process must hold
    the same values — true for deterministic init and checkpoint restores
    from a shared filesystem.
    """
    if jax.process_count() == 1:
        return packed_replicate(mesh, tree)
    sharding = replicated(mesh)

    def mk(x):
        a = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, a, a.shape)

    return jax.tree.map(mk, tree)


def global_shard(mesh: Mesh, tree, batch_axis: int = 0):
    """Place a host batch pytree with ``batch_axis`` sharded over ``data``,
    multi-process-safe.

    Single-process: one batched device_put (shard_batch). Multi-process:
    each process feeds only its contiguous block of the batch axis
    (process_local_batch_slice — GSPMD ceil-division block layout over the
    process-grouped device order of ``jax.devices()``), assembled into a
    global array with ``jax.make_array_from_process_local_data``. This is
    the production multi-host data-feeding path (SURVEY.md §2.9): host
    loaders never touch non-addressable devices.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, tree, batch_axis)
    from .distributed import process_local_batch_slice

    sharding = batch_sharding(mesh, batch_axis)

    def mk(x):
        a = np.asarray(x)
        rows = process_local_batch_slice(a.shape[batch_axis])
        index = (slice(None),) * batch_axis + (rows,)
        return jax.make_array_from_process_local_data(sharding, a[index], a.shape)

    return jax.tree.map(mk, tree)


def packed_replicate(mesh: Mesh, tree):
    """Replicate a many-leaf pytree with ONE transfer per dtype.

    Per-leaf device_put costs a dispatch round-trip per array — ~0.5 s each
    through a remote-TPU tunnel, minutes for a 200-leaf train state. Here the
    leaves are concatenated host-side into one flat buffer per dtype,
    transferred once, and unpacked on device by a single jitted function.
    """
    import numpy as np

    leaves, treedef = jax.tree.flatten(tree)
    sharding = replicated(mesh)

    order_by_dtype = {}
    for i, leaf in enumerate(leaves):
        order_by_dtype.setdefault(np.dtype(jax.numpy.asarray(leaf).dtype if not hasattr(leaf, "dtype") else leaf.dtype), []).append(i)

    host_bufs = {}
    for dt, idxs in order_by_dtype.items():
        host_bufs[dt] = np.concatenate([np.ravel(np.asarray(leaves[i])) for i in idxs])

    dev_bufs = {dt: jax.device_put(buf, sharding) for dt, buf in host_bufs.items()}

    def unpack(bufs):
        out = [None] * len(leaves)
        for dt, idxs in order_by_dtype.items():
            offset = 0
            buf = bufs[str(dt)]
            for i in idxs:
                size = int(np.prod(np.shape(leaves[i]), dtype=np.int64)) if np.shape(leaves[i]) else 1
                chunk = jax.lax.dynamic_slice_in_dim(buf, offset, size)
                out[i] = chunk.reshape(np.shape(leaves[i]))
                offset += size
        return jax.tree.unflatten(treedef, out)

    unpack_jit = jax.jit(unpack, out_shardings=jax.tree.map(lambda _: sharding, tree))
    return unpack_jit({str(dt): b for dt, b in dev_bufs.items()})
