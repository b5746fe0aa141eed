"""Variable-length GAN training driver (BASELINE config 5 end-to-end).

The masked twin of ``gan_loop.train_gan``: device-resident padded traces +
validity masks, the transformer generator (its attention consumes the mask),
whole epochs as one scanned program, the same mesh/sharding, LR schedule,
checkpointing, and failure-detection contract.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (
    DEFAULT_RUNTIME_CONFIG,
    DEFAULT_TRAINING_CONFIG,
    ModelConfig,
    RuntimeConfig,
    TrainingConfig,
)
from ..data.variable_length import VariableGestureArrays
from ..parallel.mesh import (
    batch_sharding,
    create_mesh,
    global_replicate,
    global_shard,
    replicate,
)
from ..utils.logging import log
from ..utils.preemption import PreemptionGuard
from ..utils.profiling import Throughput
from .checkpoint import restore_checkpoint, save_checkpoint
from .gan_loop import TrainResult
from .history import append_history, truncate_history
from .masked_step import gan_train_epoch_masked, make_epoch_batches_masked
from .schedules import cosine_annealing_lr
from .state import init_gan_state


def train_variable_gan(
    train_ds: VariableGestureArrays,
    model_config: ModelConfig,
    training_config: TrainingConfig = DEFAULT_TRAINING_CONFIG,
    runtime_config: RuntimeConfig = DEFAULT_RUNTIME_CONFIG,
    num_epochs: Optional[int] = None,
    seed: int = 42,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    epoch_callback: Optional[Callable[[int, Dict, Dict[str, float]], None]] = None,
    verbose: bool = True,
) -> TrainResult:
    """Full variable-length training run (transformer generator required)."""
    assert model_config.generator_type == "transformer", (
        "--variable-length training uses the transformer generator"
    )
    multi = jax.process_count() > 1
    is_main = jax.process_index() == 0
    say = log if (verbose and is_main) else (lambda *_: None)
    num_epochs = num_epochs or training_config.num_epochs

    mesh = create_mesh(runtime_config.data_axis_size, runtime_config.mesh_axis_names)
    n_shards = mesh.devices.size
    say(f"Mesh: {n_shards} device(s) on axis {runtime_config.mesh_axis_names} "
        f"(variable-length, masked)")

    if multi:
        # Multi-host: host-resident dataset, per-process local batch feeding
        # (same contract as gan_loop.train_gan — see its multi branch).
        host_store = {
            "gesture": np.ascontiguousarray(train_ds.gestures, np.float32),
            "prototype": np.ascontiguousarray(train_ds.prototypes, np.float32),
            "mask": np.ascontiguousarray(train_ds.masks(), np.float32),
        }
    else:
        g_dev = replicate(mesh, jnp.asarray(train_ds.gestures, jnp.float32))
        p_dev = replicate(mesh, jnp.asarray(train_ds.prototypes, jnp.float32))
        m_dev = replicate(mesh, jnp.asarray(train_ds.masks(), jnp.float32))

    state = init_gan_state(seed, model_config, training_config)
    start_epoch = 0
    if resume and checkpoint_dir:
        restored = restore_checkpoint(state, checkpoint_dir)
        if restored is not None:
            state = restored
            start_epoch = int(np.asarray(state["epoch"]))
            truncate_history(checkpoint_dir, start_epoch)
            say(f"Resumed from checkpoint at epoch {start_epoch}")
    state = global_replicate(mesh, state)

    if start_epoch >= num_epochs:
        say(f"Already trained to epoch {start_epoch}, nothing to do.")
        return TrainResult(state=state)

    batch_shard = batch_sharding(mesh, batch_axis=1)
    donate = (0,) if runtime_config.donate_state else ()
    if runtime_config.scan_epoch:
        epoch_fn = jax.jit(
            lambda s, eb, lr: gan_train_epoch_masked(s, eb, lr, model_config,
                                                     training_config),
            donate_argnums=donate,
        )
    else:
        # Same per-batch host-loop strategy gan_loop honors for
        # RuntimeConfig.scan_epoch=False (the measured-faster single-chip
        # default; see configs.py).
        from .masked_step import gan_train_step_masked

        step_fn = jax.jit(
            lambda s, b, lr: gan_train_step_masked(s, b, lr, model_config,
                                                   training_config),
            donate_argnums=donate,
        )

        def epoch_fn(s, eb, lr):
            n = eb["gesture"].shape[0]
            traces = []
            for i in range(n):
                s, m = step_fn(s, {k: v[i] for k, v in eb.items()}, lr)
                traces.append(m)
            s = dict(s)
            s["epoch"] = s["epoch"] + 1
            if not traces:
                # Zero-batch epoch: empty traces with the right keys (see
                # gan_loop.py's identical guard).
                shapes = jax.eval_shape(
                    lambda st, b: gan_train_step_masked(
                        st, b, lr, model_config, training_config)[1],
                    s, {k: jnp.zeros((training_config.batch_size, *v.shape[2:]),
                                     v.dtype)
                        for k, v in eb.items()})
                return s, {k: jnp.zeros((0,), v.dtype) for k, v in shapes.items()}
            return s, {k: jnp.stack([m[k] for m in traces]) for k in traces[0]}

    throughput = Throughput(n_chips=n_shards)
    history = []
    samples_per_epoch = (len(train_ds) // training_config.batch_size) * training_config.batch_size

    with PreemptionGuard() as preempt:
        for epoch in range(start_epoch, num_epochs):
            lr = jnp.float32(cosine_annealing_lr(
                training_config.learning_rate, epoch, num_epochs,
                training_config.lr_scheduler_eta_min))
            shuffle_key = jax.random.fold_in(jax.random.PRNGKey(seed ^ 0x5EED), epoch)
            if multi:
                B = training_config.batch_size
                n = host_store["gesture"].shape[0]
                nb = n // B
                sel = np.asarray(jax.random.permutation(shuffle_key, n))[: nb * B]
                batches = global_shard(mesh, {
                    k: v[sel].reshape(nb, B, *v.shape[1:])
                    for k, v in host_store.items()
                }, batch_axis=1)
            else:
                batches = make_epoch_batches_masked(shuffle_key, g_dev, p_dev, m_dev,
                                                    training_config.batch_size)
                batches = jax.tree.map(lambda x: jax.device_put(x, batch_shard), batches)

            t0 = time.perf_counter()
            state, traces = epoch_fn(state, batches, lr)
            jax.block_until_ready(traces)
            dt = time.perf_counter() - t0
            throughput.update(samples_per_epoch, dt)

            # Zero-batch epoch (len(train_ds) < batch_size, drop_last): no-op
            # with 0-valued losses, not a NaN-guard trip (np.mean of empty).
            empty = next(iter(traces.values())).shape[0] == 0 if traces else True
            losses = {k: (0.0 if empty else float(np.mean(v))) for k, v in traces.items()}
            losses["lr"] = float(lr)
            bad = [k for k, v in losses.items() if not np.isfinite(v)]
            if bad:
                raise FloatingPointError(
                    f"Non-finite losses at epoch {epoch + 1}: {bad}. "
                    f"Last good checkpoint is in {checkpoint_dir!r}.")
            history.append(losses)
            append_history(checkpoint_dir, epoch, losses)
            say(f"Epoch {epoch + 1}/{num_epochs} [{dt:.1f}s, "
                f"{samples_per_epoch / max(dt, 1e-9):.0f} gestures/s] - "
                f"D1:{losses['d1_loss']:.3f} D2:{losses['d2_loss']:.3f} "
                f"C1:{losses['cycle1_total']:.3f} C2:{losses['cycle2_total']:.3f} "
                f"Rec:{losses['cycle2_rec']:.3f} LR:{float(lr):.6f}")

            if epoch_callback is not None and is_main:
                epoch_callback(epoch, state, losses)
            saved = False
            if checkpoint_dir and (
                (epoch + 1) % training_config.save_every == 0 or epoch == num_epochs - 1
            ):
                save_checkpoint(state, checkpoint_dir, epoch)
                say(f"  Checkpoint saved at epoch {epoch + 1}")
                saved = True

            if preempt.agreed():
                # Graceful preemption: persist the completed epoch, exit
                # cleanly, resume on rerun (utils/preemption.py).
                if checkpoint_dir and not saved:
                    save_checkpoint(state, checkpoint_dir, epoch)
                say(f"Preemption signal received — stopped cleanly after "
                    f"epoch {epoch + 1}; rerun to resume.")
                break

    say(f"Training done: {throughput.per_sec:.0f} gestures/s "
        f"({throughput.per_sec_per_chip:.0f}/chip over {n_shards} chip(s))")
    return TrainResult(state=state, history=history, throughput=throughput)


import functools


@functools.partial(jax.jit, static_argnames=("model_config", "batch", "n_chunks"))
def _generate_variable_scanned(g_params, protos_padded, masks_padded, key, truncation,
                               model_config: ModelConfig, batch: int, n_chunks: int):
    """Masked sampling as one scanned device program (variable-length twin of
    gan_loop._generate_scanned)."""
    from ..models.generators import transformer_generator_apply

    protos = protos_padded.reshape(n_chunks, batch, *protos_padded.shape[1:])
    masks = masks_padded.reshape(n_chunks, batch, masks_padded.shape[1])

    def body(_, xs):
        c, proto, mask = xs
        z = jax.random.normal(jax.random.fold_in(key, c),
                              (batch, model_config.latent_dim)) * truncation
        out = transformer_generator_apply(g_params, proto, z, model_config, pad_mask=mask)
        return None, out * mask[:, :, None]

    _, out = jax.lax.scan(
        body, None,
        (jnp.arange(n_chunks, dtype=jnp.int32), protos, masks))
    return out.reshape(n_chunks * batch, *out.shape[2:])


def generate_variable_gestures(
    state: Dict,
    prototypes: np.ndarray,      # (N, L, 3) padded
    masks: np.ndarray,           # (N, L) validity
    model_config: ModelConfig,
    truncation: float = 1.0,
    seed: int = 0,
    batch: int = 512,
) -> np.ndarray:
    """Batched masked sampling from a variable-length (transformer) GAN.
    Padding positions come back zeroed; consumers use the mask/lengths."""
    g_params = state["g"]["params"]
    if jax.process_count() > 1:
        g_params = jax.tree.map(np.asarray, g_params)   # see gan_loop.generate_gestures
    g_params = jax.device_put(g_params)
    n = len(prototypes)
    if n == 0:
        return np.zeros((0, *prototypes.shape[1:]), np.float32)
    from ..utils.chunking import chunk_layout, pad_to_chunks

    batch, n_chunks = chunk_layout(n, batch)
    p_pad = pad_to_chunks(prototypes, batch, n_chunks)
    m_pad = pad_to_chunks(masks, batch, n_chunks)
    out = _generate_variable_scanned(g_params, jnp.asarray(p_pad), jnp.asarray(m_pad),
                                     jax.random.PRNGKey(seed), jnp.float32(truncation),
                                     model_config, batch, n_chunks)
    return np.asarray(out)[:n]
