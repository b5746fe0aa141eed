"""End-to-end smoke of the actual CLI entry points (SURVEY §4f): train a
tiny GAN through ``train_gan.py``, synthesize through
``generate_gestures.py``, and evaluate through ``eval_gan.py`` — each in a
fresh subprocess, exactly as a user runs them.

Subprocesses must pin the CPU platform through the config API before any
device use (site customization imports jax pinned to the ambient TPU
platform; the env var alone is not honored, and a dead TPU tunnel would
hang ``jax.devices()`` forever)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _run_cli(script: str, argv: list, timeout: int = 540, expect_rc: int = 0) -> str:
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, runpy\n"
        f"sys.argv = {[script] + argv!r}\n"
        f"runpy.run_path({str(REPO / script)!r}, run_name='__main__')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == expect_rc, (
        f"{script} {' '.join(argv)} gave rc={proc.returncode} "
        f"(expected {expect_rc}):\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    return proc.stdout + proc.stderr


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    ckdir = tmp_path_factory.mktemp("cli_ckpt")
    out = _run_cli("train_gan.py", [
        "--epochs", "1", "--synthetic", "--batch-size", "16", "--max-files", "10",
        "--no-resume", "--checkpoint-dir", str(ckdir), "--precision", "float32",
    ])
    assert "Training complete!" in out
    assert any(ckdir.iterdir()), "no checkpoint written"
    return ckdir


def test_train_cli_writes_checkpoint_and_logs(trained_ckpt):
    names = {p.name for p in trained_ckpt.iterdir()}
    assert any("latest" in n or "epoch" in n for n in names), names


def test_generate_cli_roundtrip(trained_ckpt, tmp_path):
    out_npz = tmp_path / "g.npz"
    out = _run_cli("generate_gestures.py", [
        "--words", "the,quick,brown", "--samples-per-word", "2",
        "--checkpoint-dir", str(trained_ckpt), "--out", str(out_npz),
        "--precision", "float32", "--batch", "8",
    ])
    assert "Wrote" in out
    data = np.load(out_npz, allow_pickle=False)
    assert data["gestures"].shape == (6, 128, 3)
    assert data["prototypes"].shape == (6, 128, 3)
    assert list(data["words"]) == ["the", "the", "quick", "quick", "brown", "brown"]
    g = data["gestures"]
    assert np.isfinite(g).all() and np.abs(g).max() <= 1.0 + 1e-6


def test_eval_cli_prints_metric_tables(trained_ckpt):
    out = _run_cli("eval_gan.py", [
        "--model", "gan", "--n-samples", "32", "--fast", "--synthetic",
        "--max-files", "10", "--checkpoint-dir", str(trained_ckpt),
        "--precision", "float32",
    ], timeout=540)
    # Paper-comparison table rows (reference eval_gan.py:218-273 format).
    for needle in ("L2 Wasserstein", "Precision", "Recall", "FID"):
        assert needle in out, f"missing {needle!r} in eval output"


def test_train_cli_variable_length(tmp_path_factory):
    """--variable-length: natural-resolution loader + masked transformer
    two-cycle step through the real CLI (BASELINE config 5)."""
    ckdir = tmp_path_factory.mktemp("cli_vl")
    out = _run_cli("train_gan.py", [
        "--epochs", "1", "--synthetic", "--batch-size", "8", "--max-files", "8",
        "--no-resume", "--checkpoint-dir", str(ckdir), "--precision", "float32",
        "--variable-length",
    ])
    assert "Training complete!" in out
    assert any(ckdir.iterdir())


def test_eval_cli_large_scale(trained_ckpt):
    """--large-scale N: device-side bulk generation + the 100k-scale
    distribution metrics (sliced-W2, energy distance, chunked kNN) at a
    CPU-sized N."""
    out = _run_cli("eval_gan.py", [
        "--large-scale", "256", "--synthetic", "--max-files", "10",
        "--checkpoint-dir", str(trained_ckpt), "--precision", "float32",
    ], timeout=540)
    assert "sliced" in out.lower() or "energy" in out.lower(), out[-1500:]


def test_eval_cli_min_jerk_baseline():
    """--model min-jerk needs no checkpoint: fits the minimum-jerk model on
    the train split, generates per test word, runs the same metric suite."""
    out = _run_cli("eval_gan.py", [
        "--model", "min-jerk", "--n-samples", "24", "--fast", "--synthetic",
        "--max-files", "10", "--checkpoint-dir", "/tmp/cli_e2e_minjerk_cache",
    ], timeout=540)
    for needle in ("L2 Wasserstein", "Precision", "Recall"):
        assert needle in out, f"missing {needle!r} in min-jerk eval output"


def test_contrastive_train_and_eval_clis(tmp_path_factory):
    ckdir = tmp_path_factory.mktemp("cli_contrastive")
    out = _run_cli("train_contrastive.py", [
        "--epochs", "1", "--synthetic", "--max-files", "20",
        "--no-resume", "--checkpoint-dir", str(ckdir),
    ])
    assert "complete" in out.lower()
    out = _run_cli("eval_contrastive.py", [
        "--synthetic", "--max-files", "20", "--checkpoint-dir", str(ckdir),
        "--output-dir", str(ckdir / "eval_out"),
    ])
    assert "recall" in out.lower()


def test_generate_cli_errors_without_checkpoint(tmp_path):
    out = _run_cli("generate_gestures.py",
                   ["--words", "the", "--checkpoint-dir", str(tmp_path / "none")],
                   timeout=240, expect_rc=1)
    assert "No checkpoint" in out
