"""Graceful preemption: SIGTERM during training finishes the epoch,
checkpoints, exits 0, and a rerun resumes — the recovery story for
preemptible TPU pools (utils/preemption.py; the reference loses up to
save_every-1 epochs on the same signal)."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _spawn_train(ckdir, epochs, log_path, extra=()):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, runpy\n"
        f"sys.argv = ['train_gan.py', '--epochs', '{epochs}', '--synthetic',\n"
        f"            '--batch-size', '16', '--max-files', '10',\n"
        f"            '--checkpoint-dir', {str(ckdir)!r}] + {list(extra)!r}\n"
        f"runpy.run_path({str(REPO / 'train_gan.py')!r}, run_name='__main__')\n"
    )
    log = open(log_path, "w")
    return subprocess.Popen([sys.executable, "-c", code], cwd=REPO,
                            env=dict(os.environ, JAX_PLATFORMS="cpu"),
                            stdout=log, stderr=subprocess.STDOUT)


def _wait_for(log_path, needle, proc, timeout=420):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if needle in Path(log_path).read_text(errors="replace"):
            return
        if proc.poll() is not None:
            raise AssertionError(
                f"training exited early (rc={proc.returncode}):\n"
                f"{Path(log_path).read_text(errors='replace')[-3000:]}")
        time.sleep(1.0)
    raise AssertionError(f"timed out waiting for {needle!r}")


def test_sigterm_checkpoints_and_resumes(tmp_path):
    ckdir = tmp_path / "ck"
    log1 = tmp_path / "train1.log"
    proc = _spawn_train(ckdir, epochs=500, log_path=log1, extra=["--no-resume"])
    try:
        _wait_for(log1, "Epoch 2/", proc)       # past compile, mid-training
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
    out = log1.read_text(errors="replace")
    assert rc == 0, out[-3000:]
    assert "Preemption signal received" in out
    assert "stopped cleanly after epoch" in out
    assert ckdir.exists() and any(ckdir.iterdir()), "no checkpoint written"

    # Rerun the same command (resume on by default): picks up where it
    # stopped instead of restarting at epoch 0.
    log2 = tmp_path / "train2.log"
    proc2 = _spawn_train(ckdir, epochs=500, log_path=log2)
    try:
        _wait_for(log2, "Resumed from checkpoint at epoch", proc2)
        resumed = log2.read_text(errors="replace")
        proc2.send_signal(signal.SIGTERM)
        proc2.wait(timeout=300)
    finally:
        if proc2.poll() is None:
            proc2.kill()
    import re

    m = re.search(r"Resumed from checkpoint at epoch (\d+)", resumed)
    assert m and int(m.group(1)) >= 1
