"""Multi-host (multi-process) initialization for TPU pods.

The reference trains on exactly one CUDA device (src/gan/trainer.py:37) and
has no distributed backend at all; its CPU-side parallelism is process pools.
Here the single-host data-parallel path needs *no* runtime support beyond
``jax.sharding`` (XLA emits ICI collectives inside the jitted step). Crossing
hosts — a v5e-16+ pod slice or multiple pod workers — additionally requires
each process to join the same JAX distributed runtime before first device
use; this module is that entry point.

Design: initialization is environment-gated and idempotent. On Cloud TPU
pods the coordinator address / process count / process id are discoverable
from the TPU metadata (jax.distributed.initialize() with no arguments); on
manual clusters they come from the standard JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID variables. Single-process runs are the
default and skip initialization entirely, so every CLI works unchanged on
one host.

After ``maybe_init_distributed()``, ``create_mesh`` (mesh.py) builds its
1-D ``data`` axis over ``jax.devices()`` — which then spans *all* hosts'
devices — and the jitted train steps run SPMD: each process feeds its local
shard of the globally-sharded batch, and XLA routes gradient all-reduces
over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def distributed_env_requested() -> bool:
    """True when the environment asks for multi-process JAX: either explicit
    JAX_NUM_PROCESSES/JAX_COORDINATOR_ADDRESS, or a forced opt-in via
    WGG_DISTRIBUTED=1 (e.g. on Cloud TPU pods where discovery is automatic)."""
    if os.environ.get("WGG_DISTRIBUTED") == "1":
        return True
    n = os.environ.get("JAX_NUM_PROCESSES")
    if n is not None and n.isdigit() and int(n) > 1:
        return True
    return False


def maybe_init_distributed(verbose: bool = True) -> bool:
    """Join the JAX distributed runtime when the environment requests it.

    Must run before any other jax API touches the backend. Returns True when
    multi-process mode is active (after this, ``jax.devices()`` is global and
    ``jax.process_index()`` identifies this host). Idempotent; single-process
    environments return False without importing the distributed machinery.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    if not distributed_env_requested():
        return False

    import jax

    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc and pid:
        kwargs = dict(coordinator_address=addr, num_processes=int(nproc),
                      process_id=int(pid))
    # else: argument-free initialize() — Cloud TPU pod auto-discovery.
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    if verbose:
        from ..utils.logging import log

        log(f"Distributed JAX: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    return True


def process_local_batch_slice(global_batch: int) -> slice:
    """The half-open row range of the global batch this process should feed
    (contiguous block layout, matching batch_sharding over the data axis).
    Single-process: the whole batch."""
    import jax

    n = jax.process_count() if _INITIALIZED else 1
    i = jax.process_index() if _INITIALIZED else 0
    # Ceil-division blocks — GSPMD/NamedSharding partitions a dimension into
    # ceil(size/n)-row blocks (the last may be short), so floor-division
    # slices would misassign rows whenever global_batch % n != 0.
    per = -(-global_batch // n)
    return slice(min(i * per, global_batch), min((i + 1) * per, global_batch))
