"""High-level GAN training driver: data → device, sharded epoch scans,
cosine LR, checkpoint/resume, throughput counters, periodic figures.

Framework equivalent of the reference's embedded TRAIN_SCRIPT
(/root/reference/train_gan.py:38-200) minus the Modal sandbox indirection —
it runs directly on the TPU host. The per-epoch body is one jitted
``lax.scan`` over device-resident batches (see gan_step.py).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import (
    DEFAULT_MODEL_CONFIG,
    DEFAULT_RUNTIME_CONFIG,
    DEFAULT_TRAINING_CONFIG,
    ModelConfig,
    RuntimeConfig,
    TrainingConfig,
)
from ..data.pipeline import GestureArrays, within_word_diversity
from ..models.gan import generator_apply
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
from .gan_step import gan_train_epoch, gan_train_step, make_epoch_batches
from .history import append_history, truncate_history
from .schedules import cosine_annealing_lr
from .state import init_gan_state


@dataclass
class TrainResult:
    state: Dict
    history: List[Dict[str, float]] = field(default_factory=list)
    throughput: Optional[Throughput] = None


def train_gan(
    train_ds: GestureArrays,
    model_config: ModelConfig = DEFAULT_MODEL_CONFIG,
    training_config: TrainingConfig = DEFAULT_TRAINING_CONFIG,
    runtime_config: RuntimeConfig = DEFAULT_RUNTIME_CONFIG,
    num_epochs: Optional[int] = None,
    seed: int = 42,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    epoch_callback: Optional[Callable[[int, Dict, Dict[str, float]], None]] = None,
    verbose: bool = True,
) -> TrainResult:
    """Full training run.

    Data-parallel layout: the batch axis of each epoch's (n_batches, B, L, 3)
    stack is sharded over the ``data`` mesh axis; params/optimizer state are
    replicated; XLA all-reduces gradients over ICI inside the jitted epoch.

    ``epoch_callback(epoch, state, losses)`` fires after every epoch (for
    figures / wandb); checkpoints at ``save_every`` cadence + final epoch
    (reference train_gan.py:189-196).
    """
    multi = jax.process_count() > 1
    is_main = jax.process_index() == 0
    say = log if (verbose and is_main) else (lambda *_: None)
    num_epochs = num_epochs or training_config.num_epochs

    if training_config.lambda_div and training_config.div_margin is None:
        # Data-driven hinge margin: the corpus's own within-word spread.
        # Must happen before the step is compiled — div_margin is a static
        # constant inside the jitted program.
        margin = within_word_diversity(train_ds)
        training_config = dataclasses.replace(training_config, div_margin=margin)
        say(f"Diversity hinge margin measured from data: {margin:.4f} "
            f"(mean within-word L1)")

    mesh = create_mesh(runtime_config.data_axis_size, runtime_config.mesh_axis_names)
    n_shards = mesh.devices.size
    say(f"Mesh: {n_shards} device(s) on axis {runtime_config.mesh_axis_names}"
        + (f" across {jax.process_count()} processes" if multi else ""))

    if multi:
        # Multi-host (pod) path: the dataset stays in host memory on every
        # process; each epoch's batch stack is assembled host-side and each
        # process feeds only its local block of the global batch axis
        # (global_shard → jax.make_array_from_process_local_data). device_put
        # cannot address other hosts' devices, so the single-host
        # device-resident shuffle below is unusable here.
        g_host = np.ascontiguousarray(train_ds.gestures, np.float32)
        p_host = np.ascontiguousarray(train_ds.prototypes, np.float32)
    else:
        # Device-resident dataset, replicated (small); batches get sharded.
        g_dev = replicate(mesh, jnp.asarray(train_ds.gestures, jnp.float32))
        p_dev = replicate(mesh, jnp.asarray(train_ds.prototypes, jnp.float32))

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

    batch_shard = batch_sharding(mesh, batch_axis=1)   # (n_batches, B, ...)

    donate = (0,) if runtime_config.donate_state else ()
    if runtime_config.scan_epoch:
        epoch_fn = jax.jit(
            lambda s, eb, lr: gan_train_epoch(s, eb, lr, model_config, training_config),
            donate_argnums=donate,
        )
    else:
        # Host loop of per-batch jitted steps (see RuntimeConfig.scan_epoch):
        # same step function, dispatched per batch; metric stacking happens
        # on host at epoch end.
        step_fn = jax.jit(
            lambda s, b, lr: gan_train_step(s, b, lr, model_config, training_config),
            donate_argnums=donate,
        )

        def epoch_fn(s, eb, lr):
            n = eb["gesture"].shape[0]
            traces = []
            for i in range(n):
                s, m = step_fn(s, {"gesture": eb["gesture"][i],
                                   "prototype": eb["prototype"][i]}, lr)
                traces.append(m)
            s = dict(s)
            s["epoch"] = s["epoch"] + 1
            if not traces:
                # Zero-batch epoch (len(train_ds) < batch_size): no-op with
                # empty traces, like the scanned path. eval_shape gives the
                # metric keys/dtypes without running a step.
                shapes = jax.eval_shape(
                    lambda st, b: gan_train_step(st, b, lr, model_config,
                                                 training_config)[1],
                    s, {k: jnp.zeros((training_config.batch_size, *v.shape[2:]),
                                     v.dtype)
                        for k, v in eb.items()})
                return s, {k: jnp.zeros((0,), v.dtype) for k, v in shapes.items()}
            return s, {k: jnp.stack([m[k] for m in traces]) for k in traces[0]}

    throughput = Throughput(n_chips=n_shards)
    history: List[Dict[str, float]] = []
    samples_per_epoch = (len(train_ds) // training_config.batch_size) * training_config.batch_size

    with PreemptionGuard() as preempt:
        for epoch in range(start_epoch, num_epochs):
            lr = jnp.float32(
                cosine_annealing_lr(
                    training_config.learning_rate, epoch, num_epochs,
                    training_config.lr_scheduler_eta_min,
                )
            )
            shuffle_key = jax.random.fold_in(jax.random.PRNGKey(seed ^ 0x5EED), epoch)
            if multi:
                # Same permutation stream as the single-host device shuffle
                # (threefry is backend/topology-invariant), computed on the
                # local default device and applied host-side.
                B = training_config.batch_size
                n = g_host.shape[0]
                nb = n // B
                sel = np.asarray(jax.random.permutation(shuffle_key, n))[: nb * B]
                batches = global_shard(mesh, {
                    "gesture": g_host[sel].reshape(nb, B, *g_host.shape[1:]),
                    "prototype": p_host[sel].reshape(nb, B, *p_host.shape[1:]),
                }, batch_axis=1)
            else:
                batches = make_epoch_batches(
                    shuffle_key, g_dev, p_dev, training_config.batch_size
                )
                batches = jax.tree.map(lambda x: jax.device_put(x, batch_shard), batches)

            t0 = time.perf_counter()
            state, traces = epoch_fn(state, batches, lr)
            jax.block_until_ready(traces)
            dt = time.perf_counter() - t0
            throughput.update(samples_per_epoch, dt)

            # Zero-batch epoch (len(train_ds) < batch_size, torch drop_last
            # semantics): a no-op with 0-valued losses, not a NaN-guard trip.
            empty = next(iter(traces.values())).shape[0] == 0 if traces else True
            losses = {k: (0.0 if empty else float(np.mean(v))) for k, v in traces.items()}
            losses["lr"] = float(lr)
            # Failure detection: a non-finite loss means the run is diverging —
            # stop before burning epochs / writing a poisoned checkpoint
            # (the reference has no such guard; SURVEY.md §5).
            bad = [k for k, v in losses.items() if not np.isfinite(v)]
            if bad:
                raise FloatingPointError(
                    f"Non-finite losses at epoch {epoch + 1}: {bad}. "
                    f"Last good checkpoint is in {checkpoint_dir!r}."
                )
            history.append(losses)
            append_history(checkpoint_dir, epoch, losses)
            say(
                f"Epoch {epoch + 1}/{num_epochs} [{dt:.1f}s, "
                f"{samples_per_epoch / max(dt, 1e-9):.0f} gestures/s] - "
                f"D1:{losses['d1_loss']:.3f} D2:{losses['d2_loss']:.3f} "
                f"C1:{losses['cycle1_total']:.3f} C2:{losses['cycle2_total']:.3f} "
                f"LR:{float(lr):.6f}"
            )

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
                # Graceful preemption (SIGTERM/SIGINT): the epoch that was
                # in flight has completed — persist it and exit cleanly so a
                # rerun of the same command resumes here (utils/preemption.py).
                if checkpoint_dir and not saved:
                    save_checkpoint(state, checkpoint_dir, epoch)
                say(f"Preemption signal received — stopped cleanly after "
                    f"epoch {epoch + 1}; rerun to resume.")
                break

    say(
        f"Training done: {throughput.per_sec:.0f} gestures/s "
        f"({throughput.per_sec_per_chip:.0f}/chip over {n_shards} chip(s))"
    )
    return TrainResult(state=state, history=history, throughput=throughput)


@functools.partial(jax.jit, static_argnames=("model_config", "batch", "n_chunks"))
def _generate_scanned(g_params, protos_padded, key, truncation,
                      model_config: ModelConfig, batch: int, n_chunks: int):
    """All sample chunks as ONE device program (scan over fixed-size chunks)
    — a host loop here costs a dispatch round-trip per chunk, which dominates
    at 100k-generation scale through a remote-TPU link."""
    protos = protos_padded.reshape(n_chunks, batch, *protos_padded.shape[1:])

    def body(_, xs):
        c, proto = xs
        z = jax.random.normal(jax.random.fold_in(key, c),
                              (batch, model_config.latent_dim)) * truncation
        return None, generator_apply(g_params, proto, z, model_config,
                                     inference=True)

    _, out = jax.lax.scan(body, None, (jnp.arange(n_chunks, dtype=jnp.int32), protos))
    return out.reshape(n_chunks * batch, *out.shape[2:])


def generate_gestures(
    state: Dict,
    prototypes: np.ndarray,
    model_config: ModelConfig = DEFAULT_MODEL_CONFIG,
    truncation: float = 1.0,
    seed: int = 0,
    batch: int = 512,
) -> np.ndarray:
    """Batched sampling from the trained generator
    (reference eval_gan.py:131-135: z ~ N(0,1)·truncation).

    Params are passed as jit *arguments* (device-resident), never baked as
    constants — constant-folding a param pytree into the program is
    pathological through the remote-TPU compile path. Prototypes are padded
    to whole fixed-size chunks and the per-chunk loop runs as one scanned
    device program (one dispatch, one D2H for all samples).
    """
    from ..utils.chunking import chunk_layout, pad_to_chunks

    g_params = state["g"]["params"]
    if jax.process_count() > 1:
        # Replicated global arrays can't be device_put to one local device
        # directly; pull the (identical) host copy first.
        g_params = jax.tree.map(np.asarray, g_params)
    g_params = jax.device_put(g_params)
    n = len(prototypes)
    if n == 0:
        return np.zeros((0, *prototypes.shape[1:]), np.float32)
    batch, n_chunks = chunk_layout(n, batch)
    padded = pad_to_chunks(prototypes, batch, n_chunks)
    out = _generate_scanned(g_params, jnp.asarray(padded), jax.random.PRNGKey(seed),
                            jnp.float32(truncation), model_config, batch, n_chunks)
    return np.asarray(out)[:n]
