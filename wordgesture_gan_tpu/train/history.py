"""Durable per-epoch loss history: one JSON line per completed epoch in
``<checkpoint_dir>/history.jsonl``.

The reference only has wandb/stdout; this sidecar survives offline runs and
makes resumed runs' histories contiguous. On resume, entries past the
restored epoch are truncated so a hard crash (epochs logged but never
checkpointed) followed by a rerun does not leave duplicate epoch lines.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path
from typing import Mapping, Optional


def append_history(checkpoint_dir: Optional[str], epoch: int,
                   losses: Mapping[str, float]) -> None:
    """Append one epoch record (1-based ``epoch`` field in the file)."""
    if not checkpoint_dir or _not_main_process():
        return
    path = Path(checkpoint_dir)
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "history.jsonl", "a") as f:
        f.write(json.dumps({"epoch": epoch + 1, **losses}) + "\n")


def _not_main_process() -> bool:
    # Multi-process runs share the checkpoint dir; only process 0 writes.
    import jax

    return jax.process_index() != 0


def truncate_history(checkpoint_dir: Optional[str], restored_epoch: int) -> None:
    """Drop records with ``epoch > restored_epoch`` (epochs that ran after
    the checkpoint being resumed from — they are about to be re-run).
    Rewrites atomically; malformed lines are dropped."""
    if not checkpoint_dir or _not_main_process():
        return
    path = Path(checkpoint_dir) / "history.jsonl"
    if not path.exists():
        return
    kept = []
    for line in path.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(rec, dict) and rec.get("epoch", 0) <= restored_epoch:
            kept.append(line)
    fd, tmp = tempfile.mkstemp(dir=path.parent, prefix=".history_", suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write("".join(l + "\n" for l in kept))
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
