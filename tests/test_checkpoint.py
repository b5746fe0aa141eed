"""Checkpoint / resume subsystem (train/checkpoint.py + the training loops'
resume contract — SURVEY.md §5): round-trips, missing/corrupt handling, the
run-metadata sidecar, and an end-to-end resumed training continuation."""

import json

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from wordgesture_gan_tpu.configs import ModelConfig, RuntimeConfig, TrainingConfig
from wordgesture_gan_tpu.data.pipeline import GestureArrays
from wordgesture_gan_tpu.train.checkpoint import (
    latest_epoch,
    load_run_metadata,
    restore_checkpoint,
    save_checkpoint,
    save_run_metadata,
)
from wordgesture_gan_tpu.train.state import init_gan_state

MCFG = ModelConfig(seq_length=32, gen_hidden_dim=8, gen_num_layers=2, latent_dim=8,
                   enc_hidden_dims=(24, 16), disc_hidden_dims=(24, 16))
TCFG = TrainingConfig(batch_size=8, n_critic=2, save_every=1)


@pytest.fixture(scope="module")
def state():
    return init_gan_state(0, MCFG, TCFG)


def test_save_restore_roundtrip(state, tmp_path):
    save_checkpoint(state, str(tmp_path), epoch=4)
    assert (tmp_path / "epoch_5").exists()
    assert (tmp_path / "latest").exists()
    assert latest_epoch(str(tmp_path)) == 5

    restored = restore_checkpoint(state, str(tmp_path))
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_missing_returns_none(state, tmp_path):
    assert restore_checkpoint(state, str(tmp_path / "nope")) is None
    assert latest_epoch(str(tmp_path / "nope")) == 0


def test_restore_mismatched_config_raises(state, tmp_path):
    """Restoring into a template of a different architecture must fail with
    the descriptive error, not silently misload."""
    save_checkpoint(state, str(tmp_path), epoch=0)
    other = init_gan_state(0, ModelConfig(seq_length=32, gen_hidden_dim=4,
                                          gen_num_layers=1, latent_dim=4,
                                          enc_hidden_dims=(8,), disc_hidden_dims=(8,)),
                           TCFG)
    with pytest.raises(ValueError, match="configuration"):
        restore_checkpoint(other, str(tmp_path))


def test_run_metadata_sidecar(tmp_path):
    save_run_metadata(str(tmp_path), wandb_run_id="abc123")
    save_run_metadata(str(tmp_path), extra=7)           # merge, not overwrite
    meta = load_run_metadata(str(tmp_path))
    assert meta == {"wandb_run_id": "abc123", "extra": 7}


def test_run_metadata_corrupt_tolerated(tmp_path):
    (tmp_path / "run_meta.json").write_text("{not json")
    assert load_run_metadata(str(tmp_path)) == {}
    save_run_metadata(str(tmp_path), a=1)               # recovers by rewrite
    assert json.loads((tmp_path / "run_meta.json").read_text()) == {"a": 1}


def test_training_resumes_from_checkpoint(tmp_path):
    """2 epochs, then a fresh loop asked for 4: it must restore at epoch 2,
    run exactly 2 more, and finish at epoch 4 (reference resume contract,
    train_gan.py:109-121)."""
    from wordgesture_gan_tpu.train.gan_loop import train_gan

    rng = np.random.default_rng(0)
    n = 24
    ds = GestureArrays(
        gestures=rng.uniform(-1, 1, (n, MCFG.seq_length, 3)).astype(np.float32),
        prototypes=rng.uniform(-1, 1, (n, MCFG.seq_length, 3)).astype(np.float32),
        words=["w%d" % (i % 6) for i in range(n)],
    )
    rt = RuntimeConfig(data_axis_size=1)

    r1 = train_gan(ds, MCFG, TCFG, rt, num_epochs=2, seed=0,
                   checkpoint_dir=str(tmp_path), resume=True, verbose=False)
    assert len(r1.history) == 2
    assert latest_epoch(str(tmp_path)) == 2

    r2 = train_gan(ds, MCFG, TCFG, rt, num_epochs=4, seed=0,
                   checkpoint_dir=str(tmp_path), resume=True, verbose=False)
    assert len(r2.history) == 2                          # only epochs 3 and 4
    assert latest_epoch(str(tmp_path)) == 4
    assert int(np.asarray(r2.state["epoch"])) == 4

    # resume=False starts over from epoch 0
    r3 = train_gan(ds, MCFG, TCFG, rt, num_epochs=1, seed=0,
                   checkpoint_dir=str(tmp_path / "fresh"), resume=False, verbose=False)
    assert len(r3.history) == 1


def test_latest_is_atomic_symlink(state, tmp_path):
    """`latest` is a symlink swap — no destroy-then-write window. A crash
    that leaves it dangling must fall back to the newest epoch_N."""
    save_checkpoint(state, str(tmp_path), epoch=0)
    save_checkpoint(state, str(tmp_path), epoch=1)
    latest = tmp_path / "latest"
    assert latest.is_symlink()
    import os
    assert os.readlink(latest) == "epoch_2"

    # Simulate a crash window: `latest` gone entirely.
    latest.unlink()
    restored = restore_checkpoint(state, str(tmp_path))
    assert restored is not None                      # fell back to epoch_2

    # Dangling symlink (target dir lost) also falls back, to epoch_1.
    import shutil
    os.symlink("epoch_99", latest)
    shutil.rmtree(tmp_path / "epoch_2")
    restored = restore_checkpoint(state, str(tmp_path))
    assert restored is not None
    # and a truly empty dir still returns None
    for p in tmp_path.iterdir():
        shutil.rmtree(p) if p.is_dir() else p.unlink()
    assert restore_checkpoint(state, str(tmp_path)) is None


def test_legacy_latest_dir_upgraded(state, tmp_path):
    """Old checkpoints have `latest` as a real directory; the next save must
    replace it with the symlink scheme and stay restorable."""
    import orbax.checkpoint as ocp

    host = jax.tree.map(np.asarray, jax.device_get(state))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(tmp_path / "latest", host)        # legacy real dir
    assert not (tmp_path / "latest").is_symlink()
    save_checkpoint(state, str(tmp_path), epoch=3)
    assert (tmp_path / "latest").is_symlink()
    assert restore_checkpoint(state, str(tmp_path)) is not None


def test_save_named_atomic(state, tmp_path):
    from wordgesture_gan_tpu.train.checkpoint import save_named

    save_named(state, str(tmp_path), "contrastive_latest")
    save_named(state, str(tmp_path), "contrastive_latest")   # overwrite in place
    restored = restore_checkpoint(state, str(tmp_path), name="contrastive_latest")
    assert restored is not None
    # no stray tmp/old dirs left behind
    stray = [p.name for p in tmp_path.iterdir() if p.name.startswith(".")]
    assert stray == []


def test_history_truncation(tmp_path):
    from wordgesture_gan_tpu.train.history import append_history, truncate_history

    for e in range(5):
        append_history(str(tmp_path), e, {"loss": float(e)})
    # resumed from a checkpoint written at epoch 3 → epochs 4,5 get re-run
    truncate_history(str(tmp_path), 3)
    recs = [json.loads(l) for l in (tmp_path / "history.jsonl").read_text().splitlines()]
    assert [r["epoch"] for r in recs] == [1, 2, 3]
    append_history(str(tmp_path), 3, {"loss": 9.0})
    recs = [json.loads(l) for l in (tmp_path / "history.jsonl").read_text().splitlines()]
    assert [r["epoch"] for r in recs] == [1, 2, 3, 4]
