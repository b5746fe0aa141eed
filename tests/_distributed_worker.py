"""Worker process for the two-process distributed smoke tests
(tests/test_distributed.py::test_two_process_execution and
::test_two_process_gan_training).

Launched with JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
set by the parent; joins the distributed runtime through the framework's own
entry point (parallel/distributed.py), then proves the multi-process path
end-to-end on the CPU backend. Two modes (sys.argv[1], default "toy"):

  toy — a jitted loss+grad whose backward all-reduces over BOTH processes
        (gloo CPU collectives) — the minimal collective pattern — checked
        against the unsharded single-host computation.
  gan — the REAL production training loop: ``train_gan`` (gan_loop.py) on a
        tiny deterministic dataset, exercising global_replicate /
        global_shard (make_array_from_process_local_data feeding) and the
        full two-cycle WGAN step across the process boundary. Process 0
        prints a GANRESULT line the parent compares against its own
        single-process run of the identical configuration.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np


def tiny_gan_setup():
    """Deterministic tiny GAN training configuration, shared by the workers
    and the single-process reference run in the parent test."""
    from wordgesture_gan_tpu.configs import ModelConfig, RuntimeConfig, TrainingConfig
    from wordgesture_gan_tpu.data.pipeline import GestureArrays

    rng = np.random.default_rng(0)
    n, L = 32, 16
    t = np.linspace(0.0, 1.0, L, dtype=np.float32)
    g = np.clip(rng.normal(0, 0.4, size=(n, L, 3)), -1, 1).astype(np.float32)
    p = np.clip(rng.normal(0, 0.4, size=(n, L, 3)), -1, 1).astype(np.float32)
    g[:, :, 2] = t          # monotone clock channel, like real gestures
    p[:, :, 2] = t
    ds = GestureArrays(g, p, [f"w{i % 8}" for i in range(n)])

    mcfg = ModelConfig(seq_length=L, latent_dim=4, gen_hidden_dim=4,
                       gen_num_layers=1, disc_hidden_dims=(16, 8),
                       enc_hidden_dims=(16, 8))
    tcfg = TrainingConfig(batch_size=8, n_critic=1, num_epochs=2,
                          save_every=1000)
    rcfg = RuntimeConfig(scan_epoch=True)
    return mcfg, tcfg, rcfg, ds


def gan_digest(state) -> float:
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, state["g"]["params"]))
    return float(sum(np.abs(l).sum() for l in leaves))


def run_toy():
    pid = jax.process_index()
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 4, f"expected 4 global devices, got {len(devs)}"
    assert jax.local_device_count() == 2

    mesh = Mesh(np.asarray(devs), ("data",))
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    # Global batch (16, 8), contiguous block per process (rows 0-7 / 8-15).
    rng = np.random.default_rng(0)
    x_global = rng.normal(size=(16, 8)).astype(np.float32)
    y_global = rng.normal(size=(16, 1)).astype(np.float32)
    w = jnp.asarray(rng.normal(size=(8, 1)).astype(np.float32))

    rows = slice(pid * 8, (pid + 1) * 8)
    x = jax.make_array_from_process_local_data(data_sh, x_global[rows], x_global.shape)
    y = jax.make_array_from_process_local_data(data_sh, y_global[rows], y_global.shape)

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    step = jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(repl_sh, data_sh, data_sh),
        out_shardings=(repl_sh, repl_sh),
    )
    loss, grad = step(w, x, y)

    # Single-host reference on the full batch.
    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(w, jnp.asarray(x_global), jnp.asarray(y_global))
    np.testing.assert_allclose(jax.device_get(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(jax.device_get(grad), np.asarray(ref_grad), rtol=1e-5)


def run_gan():
    """The production train_gan code path under 2 processes (VERDICT #4)."""
    from wordgesture_gan_tpu.train.gan_loop import train_gan

    mcfg, tcfg, rcfg, ds = tiny_gan_setup()
    result = train_gan(ds, mcfg, tcfg, rcfg, num_epochs=2, seed=3,
                       checkpoint_dir=None, resume=False, verbose=False)
    if jax.process_index() == 0:
        print("GANRESULT " + json.dumps(
            {"losses": result.history[-1], "digest": gan_digest(result.state)}),
            flush=True)


def run_preempt():
    """Multi-process preemption drill (VERDICT r4 #8): the parent SIGTERMs
    exactly ONE of the two processes mid-training. PreemptionGuard.agreed()
    (an allgather) must propagate the stop so BOTH processes leave the epoch
    loop on the same epoch and exit 0 — the un-signalled process must not
    sail into the next epoch's collectives and hang. Then both rerun the
    same command and the resume completes the remaining epochs.
    """
    import dataclasses
    import time

    from wordgesture_gan_tpu.train.gan_loop import train_gan

    ckpt = os.environ["WGG_TEST_CKPT"]
    mcfg, tcfg, rcfg, ds = tiny_gan_setup()
    tcfg = dataclasses.replace(tcfg, save_every=1000)   # only preemption saves

    marker = Path(ckpt) / "phase1_underway"

    def throttle(epoch, state, losses):
        # Fires on process 0 only; agreed() is a per-epoch collective, so
        # throttling one process paces both — keeping the run alive long
        # enough for the parent's SIGTERM to land mid-training.
        if epoch == 1:
            marker.write_text("go")
        time.sleep(0.05)

    res1 = train_gan(ds, mcfg, tcfg, rcfg, num_epochs=500, seed=3,
                     checkpoint_dir=ckpt, resume=False, verbose=False,
                     epoch_callback=throttle)
    stopped = len(res1.history)
    assert 0 < stopped < 500, f"expected a mid-run stop, ran {stopped} epochs"
    print(f"PHASE1 pid={jax.process_index()} epochs={stopped}", flush=True)

    # Phase 2: rerun-to-resume (the production contract: same command again).
    res2 = train_gan(ds, mcfg, tcfg, rcfg, num_epochs=stopped + 3, seed=3,
                     checkpoint_dir=ckpt, resume=True, verbose=False)
    print(f"PHASE2 pid={jax.process_index()} epochs={len(res2.history)}", flush=True)


def main():
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from wordgesture_gan_tpu.parallel import maybe_init_distributed

    assert maybe_init_distributed(verbose=False), "distributed init did not trigger"
    assert jax.process_count() == 2, jax.process_count()

    mode = sys.argv[1] if len(sys.argv) > 1 else "toy"
    {"toy": run_toy, "gan": run_gan, "preempt": run_preempt}[mode]()
    print(f"worker {jax.process_index()} OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
