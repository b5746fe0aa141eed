"""Orbax checkpointing of the train-state pytree.

Replaces the reference's torch.save dict of 8 state_dicts
(/root/reference/src/gan/trainer.py:195-230, train_gan.py:188-196) with a
single-pytree Orbax checkpoint: ``latest`` plus per-epoch snapshots, same
resume contract (restore everything, continue from epoch+1).
"""

from __future__ import annotations

import itertools
import os
import shutil
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _as_host(tree):
    # device_get batches the D2H transfers (per-leaf np.asarray serializes a
    # round-trip per array — pathological through a remote-TPU tunnel).
    return jax.tree.map(np.asarray, jax.device_get(tree))


# Barrier ids must not be reused against the coordination service; a local
# monotonic counter stays in lockstep because every process calls _sync in
# the same order the same number of times (it brackets collective saves).
_SYNC_IDS = itertools.count()


def _sync(tag: str) -> None:
    """Cross-process barrier; no-op in single-process runs."""
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    # (jax has no sync_global_processes; sync_global_devices is the
    # process barrier — an allgather over all devices.)
    multihost_utils.sync_global_devices(f"wgg:{tag}:{next(_SYNC_IDS)}")


def _atomic_save(ckptr, path: Path, host_state: Dict) -> None:
    """Crash-safe directory save: write into a hidden sibling, then swap it
    in with directory renames. A kill at any point leaves either the old
    snapshot or the new one — never a missing/partial ``path``.

    (Before this, ``rmtree(path)`` then ``save`` had a destroy-then-write
    window: a crash in between silently reset resumes to epoch 0.)

    Multi-process: EVERY process must reach this call — Orbax's
    ``Checkpointer.save`` opens with a cross-process barrier ("this method
    should be called by all hosts"); a process-0-only call deadlocks the
    primary at ``save_start`` (found by the two-process preemption drill).
    Orbax itself writes host numpy state from the primary only; the
    directory swap around it is primary-only too, with a trailing barrier
    so no process can race ahead and restore mid-swap.
    """
    primary = jax.process_index() == 0
    tmp = path.parent / f".{path.name}.tmp"
    old = path.parent / f".{path.name}.old"
    if primary and tmp.exists():
        shutil.rmtree(tmp)
    _sync(f"preclean:{path.name}")
    ckptr.save(tmp, host_state)      # collective: internal orbax barriers
    if primary:
        if old.exists() or old.is_symlink():
            shutil.rmtree(old, ignore_errors=True)
            if old.is_symlink():
                old.unlink()
        if path.is_symlink():
            path.unlink()            # symlink unlink is atomic
        elif path.exists():
            os.rename(path, old)     # window here leaves ``.old`` → cleaned next save
        os.rename(tmp, path)
        if old.exists():
            shutil.rmtree(old, ignore_errors=True)
    _sync(f"swap:{path.name}")


def save_checkpoint(state: Dict, checkpoint_dir: str, epoch: int, keep_latest: bool = True) -> None:
    """Write ``epoch_{N}`` and refresh ``latest`` (reference cadence:
    every save_every epochs + final, train_gan.py:189-196).

    ``latest`` is a relative symlink to the new ``epoch_{N}`` directory —
    one Orbax write instead of two, and the swap (symlink + os.replace) is
    atomic, so no crash can leave a run without a restorable ``latest``.

    Multi-process runs: call on ALL processes at the same loop point (the
    underlying Orbax save is a collective — see ``_atomic_save``); only
    process 0 mutates the checkpoint directory tree.
    """
    primary = jax.process_index() == 0
    base = Path(checkpoint_dir).absolute()
    base.mkdir(parents=True, exist_ok=True)
    host_state = _as_host(state)

    epoch_name = f"epoch_{epoch + 1}"
    with ocp.PyTreeCheckpointer() as ckptr:
        _atomic_save(ckptr, base / epoch_name, host_state)
    if keep_latest and primary:
        latest = base / "latest"
        tmp_link = base / f".latest.lnk.{os.getpid()}"
        if tmp_link.is_symlink() or tmp_link.exists():
            tmp_link.unlink()
        if latest.exists() and not latest.is_symlink():
            # Legacy layout: ``latest`` was a real directory. Replace it with
            # the symlink scheme; the rmtree happens only after epoch_N is
            # fully on disk, so a crash here still resumes via the fallback.
            shutil.rmtree(latest)
        os.symlink(epoch_name, tmp_link)
        os.replace(tmp_link, latest)
    _sync(f"latest:{epoch_name}")


def save_named(state: Dict, checkpoint_dir: str, name: str) -> None:
    """Crash-safe standalone named snapshot (e.g. ``contrastive_latest``).
    Call on ALL processes (collective, like save_checkpoint); only process
    0 writes."""
    base = Path(checkpoint_dir).absolute()
    base.mkdir(parents=True, exist_ok=True)
    host_state = _as_host(state)
    with ocp.PyTreeCheckpointer() as ckptr:
        _atomic_save(ckptr, base / name, host_state)


def restore_checkpoint(template: Dict, checkpoint_dir: str, name: str = "latest") -> Optional[Dict]:
    """Restore into the structure of ``template`` (a freshly-initialized
    state). Returns None when no checkpoint exists.

    If the requested snapshot is missing (or ``latest`` dangles after a
    crash mid-save), falls back to the newest intact ``epoch_N`` snapshot
    rather than silently restarting from epoch 0.
    """
    base = Path(checkpoint_dir).absolute()
    path = base / name
    if not path.exists():   # follows symlinks: dangling ``latest`` lands here
        n = latest_epoch(checkpoint_dir)
        if n <= 0:
            return None
        path = base / f"epoch_{n}"
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(path, item=_as_host(template))
        except Exception as e:
            raise ValueError(
                f"Failed to restore checkpoint at {path}. Likely causes: the "
                f"current model configuration does not match the one that "
                f"wrote it (e.g. a different --generator family or changed "
                f"layer sizes), or the checkpoint is partial/corrupt from an "
                f"interrupted save. Use the matching config, an intact "
                f"epoch_N snapshot, or a fresh --checkpoint-dir. "
                f"Underlying error: {e}"
            ) from e
    # Return host arrays; the caller device_puts onto its mesh in one shot.
    return restored


def save_run_metadata(checkpoint_dir: str, **fields) -> None:
    """Sidecar run metadata (e.g. wandb run id) alongside the checkpoints —
    the reference stores wandb_run_id inside the torch checkpoint dict
    (train_gan.py:191); Orbax pytrees hold arrays only, so it lives here."""
    import json
    import os
    import tempfile

    base = Path(checkpoint_dir).absolute()
    base.mkdir(parents=True, exist_ok=True)
    meta_path = base / "run_meta.json"
    meta = load_run_metadata(checkpoint_dir)
    meta.update(fields)
    # Atomic write: a kill mid-write must not leave a truncated file that
    # poisons every later startup.
    fd, tmp = tempfile.mkstemp(dir=base, prefix=".run_meta_", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps(meta, indent=2))
        os.replace(tmp, meta_path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_run_metadata(checkpoint_dir: str) -> dict:
    import json

    meta_path = Path(checkpoint_dir).absolute() / "run_meta.json"
    if not meta_path.exists():
        return {}
    try:
        return json.loads(meta_path.read_text())
    except (json.JSONDecodeError, OSError):
        return {}   # corrupt sidecar must not block training


def latest_epoch(checkpoint_dir: str) -> int:
    """Highest epoch number with a snapshot, or 0."""
    base = Path(checkpoint_dir)
    if not base.exists():
        return 0
    epochs = [int(p.name.split("_")[1]) for p in base.glob("epoch_*") if p.name.split("_")[1].isdigit()]
    return max(epochs, default=0)
