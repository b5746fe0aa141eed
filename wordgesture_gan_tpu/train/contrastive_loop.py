"""Contrastive encoder training: fused SupCon step, on-device epoch scan,
centroid-based recall evaluation, checkpoint/resume.

Re-design of the reference trainer (/root/reference/src/contrastive/trainer.py):
the per-batch torch loop becomes one jitted ``lax.scan`` per epoch over a
host-sampled (n_batches, N*K) index matrix gathered from the device-resident
gesture store; evaluation computes per-word centroids with one segment-sum.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import (
    DEFAULT_CONTRASTIVE_CONFIG,
    DEFAULT_RUNTIME_CONFIG,
    ContrastiveConfig,
    RuntimeConfig,
)
from ..data.contrastive import ContrastiveArrays, sample_epoch_batches
from ..losses import supervised_contrastive_loss
from ..models.contrastive import contrastive_encoder_apply, contrastive_encoder_init
from ..parallel.mesh import create_mesh, global_replicate, global_shard
from ..utils.logging import log
from ..utils.preemption import PreemptionGuard
from .checkpoint import restore_checkpoint, save_checkpoint, save_named
from .history import append_history, truncate_history
from .state import apply_update


def make_contrastive_optimizer(grad_clip: float = 1.0) -> optax.GradientTransformation:
    """clip(1.0) → Adam(0.9, 0.999) statistics; LR applied per step
    (reference trainer.py:51-55, :95)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def init_contrastive_state(key, config: ContrastiveConfig = DEFAULT_CONTRASTIVE_CONFIG) -> Dict:
    """``key``: int seed (preferred — keeps init fully on host CPU) or PRNG key."""
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        params, bn_state = contrastive_encoder_init(key, config)
        tx = make_contrastive_optimizer()
        return {
            "params": params,
            "bn": bn_state,
            "opt": tx.init(params),
            "epoch": jnp.zeros((), jnp.int32),
            "step": jnp.zeros((), jnp.int32),
            "best_recall": jnp.zeros((), jnp.float32),
        }


def contrastive_train_epoch(
    state: Dict,
    gestures: jnp.ndarray,        # (N, L, 3) device-resident store
    labels: jnp.ndarray,          # (N,)
    batch_indices: jnp.ndarray,   # (n_batches, B)
    lr_schedule: Tuple[float, float, int],   # (base_lr, eta_min, total_steps)
    config: ContrastiveConfig,
) -> Tuple[Dict, jnp.ndarray]:
    """One epoch as a lax.scan; per-step cosine annealing on the global step
    counter (reference trainer.py:203-224)."""
    base_lr, eta_min, total_steps = lr_schedule
    tx = make_contrastive_optimizer()

    def step_fn(carry, idx_row):
        params, bn, opt, step = carry
        batch = jnp.take(gestures, idx_row, axis=0)
        batch_labels = jnp.take(labels, idx_row, axis=0)
        lr = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * jnp.minimum(step, total_steps) / total_steps)
        )

        def loss_fn(p):
            emb, new_bn = contrastive_encoder_apply(p, bn, batch, train=True)
            return supervised_contrastive_loss(emb, batch_labels, config.temperature), new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params, new_opt = apply_update(params, grads, opt, tx, lr)
        return (new_params, new_bn, new_opt, step + 1), loss

    carry = (state["params"], state["bn"], state["opt"], state["step"])
    (params, bn, opt, step), losses = jax.lax.scan(step_fn, carry, batch_indices)
    new_state = {
        **state,
        "params": params, "bn": bn, "opt": opt, "step": step,
        "epoch": state["epoch"] + 1,
    }
    return new_state, losses


import functools


@functools.partial(jax.jit, static_argnames=("batch", "n_chunks"))
def _embed_scanned(pd, data_padded, batch: int, n_chunks: int):
    """All embed chunks as one scanned device program (one dispatch; a host
    chunk loop costs a round-trip per chunk through a remote-TPU link)."""
    chunks = data_padded.reshape(n_chunks, batch, *data_padded.shape[1:])
    _, out = jax.lax.scan(
        lambda _, x: (None, contrastive_encoder_apply(pd["params"], pd["bn"], x, train=False)[0]),
        None, chunks)
    return out.reshape(n_chunks * batch, -1)


def embed_gestures(state: Dict, gestures: np.ndarray, config: ContrastiveConfig,
                   batch: int = 4096) -> np.ndarray:
    """Eval-mode embeddings for an array of gestures. Params are jit args
    (never baked host-array constants — pathological to compile remotely)."""
    n = len(gestures)
    if n == 0:
        return np.zeros((0, config.embedding_dim), np.float32)
    from ..utils.chunking import chunk_layout, pad_to_chunks

    pd = {"params": state["params"], "bn": state["bn"]}
    if jax.process_count() > 1:
        # Global (replicated) arrays can't be device_put to one local device
        # directly; pull the host copy first (cheap — encoder is ~100k params).
        pd = jax.tree.map(np.asarray, pd)
    params_dev = jax.device_put(pd)
    batch, n_chunks = chunk_layout(n, batch)
    padded = pad_to_chunks(gestures, batch, n_chunks)
    return np.asarray(_embed_scanned(params_dev, jnp.asarray(padded), batch, n_chunks))[:n]


def centroid_recall(
    embeddings: np.ndarray,
    words: List[str],
    k_values: Tuple[int, ...] = (1, 5, 10),
) -> Dict[str, float]:
    """Centroid-based recall@k: mean + renormalized per-word centroids, then
    is-the-right-word-in-top-k (reference trainer.py:104-175)."""
    unique = list(dict.fromkeys(words))
    word_idx = {w: i for i, w in enumerate(unique)}
    ids = np.array([word_idx[w] for w in words])
    n_words = len(unique)

    emb = jnp.asarray(embeddings)
    seg = jax.ops.segment_sum(emb, jnp.asarray(ids), num_segments=n_words)
    counts = jax.ops.segment_sum(jnp.ones((len(words),)), jnp.asarray(ids), num_segments=n_words)
    centroids = seg / counts[:, None]
    centroids = centroids / (jnp.linalg.norm(centroids, axis=1, keepdims=True) + 1e-12)

    sim = np.asarray(emb @ centroids.T)                       # (n, n_words)
    max_k = min(max(k_values), n_words)
    topk = np.argsort(-sim, axis=1)[:, :max_k]

    results = {}
    for k in k_values:
        ka = min(k, max_k)
        hit = (topk[:, :ka] == ids[:, None]).any(axis=1)
        results[f"recall@{k}"] = float(hit.mean())
    results["accuracy"] = results["recall@1"]
    return results


def train_contrastive(
    train_data: ContrastiveArrays,
    test_data: ContrastiveArrays,
    config: ContrastiveConfig = DEFAULT_CONTRASTIVE_CONFIG,
    runtime_config: RuntimeConfig = DEFAULT_RUNTIME_CONFIG,
    num_epochs: Optional[int] = None,
    seed: int = 42,
    checkpoint_dir: Optional[str] = None,
    checkpoint_name: str = "contrastive_latest",
    resume: bool = True,
    eval_every: int = 5,
    verbose: bool = True,
) -> Tuple[Dict, Dict[str, list]]:
    """Full contrastive training run with best-recall checkpointing
    (reference trainer.py:177-251).

    Data-parallel layout mirrors the GAN loop (gan_loop.py:73-117): the
    gesture store and state are replicated over a 1-D ``data`` mesh and each
    epoch's (n_batches, B) index matrix is sharded over the batch axis. The
    SupCon similarity matrix (emb @ emb.T) and the BatchNorm batch moments
    are *global* reductions over the batch — under jit-with-sharding XLA
    inserts the all-gather / all-reduce over ICI automatically, so sharded
    training is semantically identical to single-device (tested in
    tests/test_contrastive.py::test_sharded_contrastive_epoch_matches)."""
    import random as _random

    multi = jax.process_count() > 1
    is_main = jax.process_index() == 0
    say = log if (verbose and is_main) else (lambda *_: None)
    num_epochs = num_epochs or config.num_epochs

    mesh = create_mesh(runtime_config.data_axis_size, runtime_config.mesh_axis_names)
    n_shards = mesh.devices.size
    say(f"Mesh: {n_shards} device(s) on axis {runtime_config.mesh_axis_names}"
        + (f" across {jax.process_count()} processes" if multi else ""))

    state = init_contrastive_state(seed, config)
    start_epoch = 0
    if resume and checkpoint_dir:
        restored = restore_checkpoint(state, checkpoint_dir, name=checkpoint_name)
        if restored is not None:
            state = restored
            start_epoch = int(np.asarray(state["epoch"]))
            truncate_history(checkpoint_dir, start_epoch)
            say(f"Resumed contrastive training from epoch {start_epoch}")
    state = global_replicate(mesh, state)

    # The gesture store is replicated (it is gathered from inside the step);
    # global_replicate handles both single-host (device_put) and multi-host
    # (each process contributes its identical host copy).
    g_dev = global_replicate(mesh, np.asarray(train_data.gestures, np.float32))
    l_dev = global_replicate(mesh, np.asarray(train_data.labels, np.int32))

    n_batches = len([w for w in train_data.unique_words
                     if len(train_data.word_to_indices[w]) >= config.gestures_per_word]
                    ) // config.batch_words
    total_steps = num_epochs * max(n_batches, 1)

    # Gesture store as jit ARGUMENTS (device-resident), never closed-over —
    # closures bake host arrays into the program as HLO constants, which
    # duplicates HBM and is pathological to compile remotely (same contract
    # as embed_gestures below and gan_loop's epoch_fn).
    epoch_fn = jax.jit(
        lambda s, g, l, bi: contrastive_train_epoch(
            s, g, l, bi,
            (config.learning_rate, config.eta_min, total_steps), config,
        )
    )

    history: Dict[str, list] = {"train_loss": []}
    best_recall = float(np.asarray(state["best_recall"]))

    with PreemptionGuard() as preempt:
        for epoch in range(start_epoch, num_epochs):
            # Per-epoch derived RNG: a single stateful stream restarted at seed
            # would make a resumed run replay epoch-0's batch sequences (the GAN
            # loop's fold_in(seed, epoch) pattern, made stdlib).
            sampler_rng = _random.Random(seed * 1_000_003 + epoch)
            batch_idx = sample_epoch_batches(
                train_data, config.batch_words, config.gestures_per_word, sampler_rng
            )
            t0 = time.perf_counter()
            state, losses = epoch_fn(state, g_dev, l_dev,
                                     global_shard(mesh, np.asarray(batch_idx),
                                                  batch_axis=1))
            jax.block_until_ready(losses)
            dt = time.perf_counter() - t0
            avg_loss = float(np.mean(np.asarray(losses)))
            history["train_loss"].append(avg_loss)
            append_history(checkpoint_dir, epoch, {"train_loss": avg_loss})
            say(f"Epoch {epoch + 1}/{num_epochs} [{dt:.1f}s] loss: {avg_loss:.4f}")

            if (epoch + 1) % eval_every == 0 or epoch == num_epochs - 1:
                emb = embed_gestures(state, test_data.gestures, config)
                metrics = centroid_recall(emb, test_data.words)
                for key, val in metrics.items():
                    history.setdefault(f"test_{key}", []).append(val)
                say("Evaluation: " + " | ".join(f"{k}: {v:.4f}" for k, v in metrics.items()))
                if metrics["recall@1"] > best_recall:
                    best_recall = metrics["recall@1"]
                    state = {**state, "best_recall": jnp.float32(best_recall)}
                    if checkpoint_dir:
                        save_checkpoint(state, checkpoint_dir, epoch, keep_latest=False)
                        save_named(state, checkpoint_dir, checkpoint_name)
                    say(f"New best recall@1: {best_recall:.4f}")

            if preempt.agreed():
                # Graceful preemption: persist the full resume state (the
                # epoch counter and sampler RNG derive from it), exit
                # cleanly, resume on rerun (utils/preemption.py).
                if checkpoint_dir:
                    save_checkpoint(state, checkpoint_dir, epoch, keep_latest=False)
                    save_named(state, checkpoint_dir, checkpoint_name)
                say(f"Preemption signal received — stopped cleanly after "
                    f"epoch {epoch + 1}; rerun to resume.")
                break

    if checkpoint_dir:
        save_named(state, checkpoint_dir, checkpoint_name)
    return state, history

