#!/usr/bin/env python
"""Benchmark: GAN training throughput (gestures/sec/chip) on the fused
two-cycle WGAN step at reference scale, in the production mixed-precision
(bf16 compute / fp32 params) configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"} —
``extra`` carries the other two BASELINE.md north-star counters (epoch
wall-clock at the reference's 30k-gesture scale, and batched-DTW pairs/sec).

Baseline derivation: the reference trains 200 epochs on the capped swipelogs
dataset in 17 min on an L40S (/root/reference/CLAUDE.md:98). The capped
dataset is ~30k train gestures (sum of min(count,5) over wordfreq.txt × 0.8
train ratio = 29,980), so the reference throughput is
200 × 29,980 / 1,020 s ≈ 5,880 gestures/sec through the full two-cycle
n_critic=5 step. vs_baseline = ours_per_chip / 5880.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

BASELINE_GESTURES_PER_SEC = 5880.0  # reference L40S (see module docstring)
METRIC_NAME = "gan_train_gestures_per_sec_per_chip"
METRIC_UNIT = "gestures/s/chip (two-cycle WGAN step, n_critic=5, batch 512, bf16)"
# Backend-probe schedule: ~13 min of exponential backoff. The known failure
# mode is a transiently wedged/restarting TPU tunnel (UNAVAILABLE at init or
# a hang at the first device op) — it usually recovers within minutes.
PROBE_SLEEPS = (0, 30, 60, 120, 240, 300)
PROBE_TIMEOUT_S = 150               # first init through the tunnel is ~20-40 s
DEADLINE_S = int(os.environ.get("WGG_BENCH_DEADLINE_S", "2700"))
N_TRAIN = 29_980                    # reference capped train-set size
BATCH_SIZE = 512
N_CRITIC = 5
WARMUP_EPOCHS = 1
TIMED_EPOCHS = 3
DTW_PAIRS = 4096                    # DTW micro-bench size (2000×2000 eval tiles)


def bench_train(jax, jnp, np):
    from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
    from wordgesture_gan_tpu.parallel.mesh import batch_sharding, create_mesh, packed_replicate, replicate
    from wordgesture_gan_tpu.train.gan_step import gan_train_step, make_epoch_batches
    from wordgesture_gan_tpu.train.state import init_gan_state

    model_config = ModelConfig(compute_dtype="bfloat16")
    training_config = TrainingConfig(batch_size=BATCH_SIZE, n_critic=N_CRITIC)

    mesh = create_mesh()
    n_chips = int(mesh.devices.size)

    # Reference-scale random gesture data (preprocessing is benchmarked
    # separately; the train step only sees (N, L, 3) float32 arrays).
    rng = np.random.default_rng(0)
    L = model_config.seq_length
    gestures = rng.uniform(-1, 1, (N_TRAIN, L, 3)).astype(np.float32)
    prototypes = rng.uniform(-1, 1, (N_TRAIN, L, 3)).astype(np.float32)

    g_dev = replicate(mesh, jnp.asarray(gestures))
    p_dev = replicate(mesh, jnp.asarray(prototypes))
    state = packed_replicate(mesh, init_gan_state(0, model_config, training_config))

    # Production epoch strategy (RuntimeConfig.scan_epoch=False): a host loop
    # of per-batch jitted steps — measured faster than the scanned epoch on
    # v5e (XLA schedules the isolated step better) — with the critic loop's
    # inference-only generator forwards on the fused Pallas BiLSTM kernel.
    batch_shard = batch_sharding(mesh, batch_axis=1)
    step_fn = jax.jit(
        lambda s, b, lr: gan_train_step(s, b, lr, model_config, training_config),
        donate_argnums=(0,),
    )

    samples_per_epoch = (N_TRAIN // BATCH_SIZE) * BATCH_SIZE
    lr = jnp.float32(2e-4)

    def run_epoch(state, epoch):
        key = jax.random.fold_in(jax.random.PRNGKey(1), epoch)
        eb = make_epoch_batches(key, g_dev, p_dev, BATCH_SIZE)
        eb = jax.device_put(eb, jax.tree.map(lambda _: batch_shard, eb))
        m = None
        for i in range(eb["gesture"].shape[0]):
            state, m = step_fn(state, {"gesture": eb["gesture"][i],
                                       "prototype": eb["prototype"][i]}, lr)
        # Force full materialization — on experimental PJRT backends
        # block_until_ready alone has been observed to return early.
        float(np.mean(np.asarray(m["d1_loss"])))
        return state

    for e in range(WARMUP_EPOCHS):
        t = time.perf_counter()
        state = run_epoch(state, e)
        print(f"warmup epoch {e}: {time.perf_counter() - t:.2f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for e in range(TIMED_EPOCHS):
        t = time.perf_counter()
        state = run_epoch(state, WARMUP_EPOCHS + e)
        print(f"timed epoch {e}: {time.perf_counter() - t:.2f}s", file=sys.stderr)
    dt = time.perf_counter() - t0

    epoch_seconds = dt / TIMED_EPOCHS
    per_sec = TIMED_EPOCHS * samples_per_epoch / dt
    return per_sec / n_chips, epoch_seconds


def _timed_steps(jax, jnp, np, batch_size: int, n_critic: int,
                 n_steps: int = 20) -> float:
    """Seconds per fused train step at (batch_size, n_critic), fixed batch
    (shuffle cost is excluded — it is measured by the epoch number above)."""
    from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
    from wordgesture_gan_tpu.train.gan_step import gan_train_step
    from wordgesture_gan_tpu.train.state import init_gan_state

    model_config = ModelConfig(compute_dtype="bfloat16")
    training_config = TrainingConfig(batch_size=batch_size, n_critic=n_critic)
    rng = np.random.default_rng(0)
    L = model_config.seq_length
    batch = {
        "gesture": jax.device_put(jnp.asarray(
            rng.uniform(-1, 1, (batch_size, L, 3)), jnp.float32)),
        "prototype": jax.device_put(jnp.asarray(
            rng.uniform(-1, 1, (batch_size, L, 3)), jnp.float32)),
    }
    state = jax.device_put(init_gan_state(0, model_config, training_config))
    step_fn = jax.jit(
        lambda s, b, lr: gan_train_step(s, b, lr, model_config, training_config),
        donate_argnums=(0,),
    )
    lr = jnp.float32(2e-4)
    m = None
    for _ in range(3):                       # compile + warmup
        state, m = step_fn(state, batch, lr)
    float(np.mean(np.asarray(m["d1_loss"])))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = step_fn(state, batch, lr)
    float(np.mean(np.asarray(m["d1_loss"])))  # force materialization
    return (time.perf_counter() - t0) / n_steps


def bench_batch_curve(jax, jnp, np):
    """Throughput vs batch size — answers "is 512 latency-bound?" / "where
    does the next 2x live?" (VERDICT r4 weak #6). Returns
    {batch: gestures_per_sec_per_chip}."""
    n_chips = jax.local_device_count()
    curve = {}
    for B in (512, 1024, 2048, 4096):
        sec = _timed_steps(jax, jnp, np, B, N_CRITIC)
        curve[str(B)] = round(B / sec / n_chips, 1)
        print(f"batch curve B={B}: {sec * 1e3:.2f} ms/step "
              f"({curve[str(B)]:.0f} gestures/s/chip)", file=sys.stderr)
    return curve


def bench_step_decomposition(jax, jnp, np):
    """Per-component step decomposition at the flagship B=512:
      * joint_ge_ms    — the n_critic=0 step (joint G+E fwd+bwd + updates);
      * critic_loop_ms — full step minus the n_critic=0 step (5 critic
                         iterations: 10 critic updates + 5 fused 2B
                         generator inference forwards);
      * gen_fwd_inference_ms — one B=512 generator forward on the fused
                         Pallas BiLSTM inference kernel (the unit the critic
                         loop dispatches twice per iteration, lane-tiled);
      * step_total_ms  — the production n_critic=5 step.
    """
    from wordgesture_gan_tpu.configs import ModelConfig
    from wordgesture_gan_tpu.models.gan import generator_apply, generator_init

    step_total = _timed_steps(jax, jnp, np, BATCH_SIZE, N_CRITIC)
    joint_ge = _timed_steps(jax, jnp, np, BATCH_SIZE, 0)

    model_config = ModelConfig(compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    L = model_config.seq_length
    proto = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (BATCH_SIZE, L, 3)), jnp.float32))
    z = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (BATCH_SIZE, model_config.latent_dim)), jnp.float32))
    params = jax.device_put(generator_init(jax.random.PRNGKey(0), model_config))
    fwd = jax.jit(lambda p, pr, zz: generator_apply(p, pr, zz, model_config,
                                                    inference=True))
    out = fwd(params, proto, z)
    float(np.mean(np.asarray(out)))
    t0 = time.perf_counter()
    for _ in range(50):
        out = fwd(params, proto, z)
    float(np.mean(np.asarray(out)))
    gen_fwd = (time.perf_counter() - t0) / 50

    decomp = {
        "step_total_ms": round(step_total * 1e3, 2),
        "joint_ge_ms": round(joint_ge * 1e3, 2),
        "critic_loop_ms": round((step_total - joint_ge) * 1e3, 2),
        "gen_fwd_inference_ms": round(gen_fwd * 1e3, 2),
    }
    print(f"step decomposition: {decomp}", file=sys.stderr)
    return decomp


def bench_contrastive(jax, jnp, np):
    """Contrastive-encoder training throughput (gestures/s through the
    SupCon step at the reference's 32-words × 2-gestures batch;
    src/contrastive/trainer.py is the torch hot loop this replaces)."""
    from wordgesture_gan_tpu.configs import ContrastiveConfig
    from wordgesture_gan_tpu.train.contrastive_loop import (
        contrastive_train_epoch,
        init_contrastive_state,
    )

    cfg = ContrastiveConfig()
    B = cfg.batch_words * cfg.gestures_per_word
    n_store, n_batches = 20_000, 256
    rng = np.random.default_rng(2)
    store = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (n_store, cfg.seq_length, 3)), jnp.float32))
    labels = jax.device_put(jnp.asarray(rng.integers(0, 4000, n_store), jnp.int32))
    idx = jax.device_put(jnp.asarray(
        rng.integers(0, n_store, (n_batches, B)), jnp.int32))
    state = jax.device_put(init_contrastive_state(0, cfg))

    # Store/labels are jit ARGUMENTS, not closures — closing over host
    # arrays bakes them into the program as constants (the repo's
    # never-close-over contract; pathological through a remote-TPU compile).
    epoch = jax.jit(lambda s, g, l, bi: contrastive_train_epoch(
        s, g, l, bi, (cfg.learning_rate, 1e-6, n_batches * 4), cfg),
        donate_argnums=(0,))
    state, losses = epoch(state, store, labels, idx)    # compile + warmup
    float(np.mean(np.asarray(losses)))
    t0 = time.perf_counter()
    state, losses = epoch(state, store, labels, idx)
    float(np.mean(np.asarray(losses)))
    return n_batches * B / (time.perf_counter() - t0)


def bench_dtw(jax, jnp, np):
    """Batched-DTW pairs/sec on the production path (the full distance
    matrix as one fused device program — the reference's joblib-parallel
    fastdtw hot loop, src/gan/evaluation.py DTW-Wasserstein)."""
    from wordgesture_gan_tpu.ops.dtw import dtw_distance_matrix

    rng = np.random.default_rng(1)
    n = 1024
    x = rng.uniform(-1, 1, (n, 128, 2)).astype(np.float32)
    y = rng.uniform(-1, 1, (n, 128, 2)).astype(np.float32)

    dtw_distance_matrix(x, y)            # compile + warmup
    t0 = time.perf_counter()
    d = dtw_distance_matrix(x, y)
    assert d.shape == (n, n) and np.isfinite(d).all()
    return n * n / (time.perf_counter() - t0)


def _fail_json(reason: str, detail: str = "") -> None:
    """Diagnostic JSON on unrecoverable failure — one parseable line instead
    of a bare traceback, so the round record carries the failure cause and
    the last verified measurement (round 3 lost its record to exactly this:
    a transient 'UNAVAILABLE' became rc=1 with parsed:null)."""
    last_good = None
    for prev in sorted(Path(__file__).parent.glob("BENCH_r*.json"), reverse=True):
        try:
            rec = json.loads(prev.read_text())
            if rec.get("rc") == 0 and rec.get("parsed"):
                last_good = {"round_file": prev.name, **rec["parsed"]}
                break
        except (json.JSONDecodeError, OSError):
            continue
    print(json.dumps({
        "metric": METRIC_NAME,
        "value": None,
        "unit": METRIC_UNIT,
        "vs_baseline": None,
        "extra": {"error": reason, "detail": detail[-2000:],
                  "last_good": last_good},
    }))
    sys.stdout.flush()


def _probe_backend() -> str:
    """Run a tiny device computation in a SUBPROCESS with a hard timeout.

    The tunnel's two failure modes are (a) UNAVAILABLE at backend init and
    (b) an indefinite hang at the first device op when another client holds
    (or recently held) the device lease. A subprocess probe converts both
    into a clean retry without poisoning this process's jax backend state.
    Returns "" on success, else a one-line diagnosis.
    """
    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((128,128)) @ jnp.ones((128,128));"
        "assert float(np.asarray(x)[0,0]) == 128.0;"
        "print('ok', jax.devices())"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=PROBE_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        return f"probe hang (> {PROBE_TIMEOUT_S}s at first device op)"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return tail[-1] if tail else f"probe rc={r.returncode}"
    return ""


def _wait_for_backend() -> str:
    """Retry the backend probe with backoff. Returns "" once healthy."""
    last = ""
    for i, sleep_s in enumerate(PROBE_SLEEPS):
        if sleep_s:
            print(f"backend unavailable ({last}); retry {i}/{len(PROBE_SLEEPS) - 1} "
                  f"in {sleep_s}s", file=sys.stderr)
            time.sleep(sleep_s)
        last = _probe_backend()
        if not last:
            if i > 0:
                # Lease churn: connecting immediately after another client
                # exits can hang; give the tunnel a moment to settle.
                time.sleep(15)
            return ""
    return last


def main() -> None:
    # Hard deadline: a mid-bench tunnel wedge must still produce a JSON
    # record rather than hanging past the driver's patience.
    def _on_alarm(signum, frame):
        _fail_json("deadline", f"bench exceeded WGG_BENCH_DEADLINE_S={DEADLINE_S}s "
                   "(device op wedged mid-run)")
        os._exit(1)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(DEADLINE_S)

    err = _wait_for_backend()
    if err:
        _fail_json("backend unavailable after retries", err)
        sys.exit(1)

    from wordgesture_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        per_sec_per_chip, epoch_seconds = bench_train(jax, jnp, np)
        batch_curve = bench_batch_curve(jax, jnp, np)
        decomposition = bench_step_decomposition(jax, jnp, np)
        dtw_pairs_per_sec = bench_dtw(jax, jnp, np)
        contrastive_per_sec = bench_contrastive(jax, jnp, np)
    except Exception as e:  # emit a parseable record, then the real traceback
        _fail_json(type(e).__name__, str(e))
        raise

    signal.alarm(0)
    print(json.dumps({
        "metric": METRIC_NAME,
        "value": round(per_sec_per_chip, 1),
        "unit": METRIC_UNIT,
        "vs_baseline": round(per_sec_per_chip / BASELINE_GESTURES_PER_SEC, 3),
        "extra": {
            "epoch_wall_clock_s_at_30k": round(epoch_seconds, 3),
            "dtw_pairs_per_sec": round(dtw_pairs_per_sec, 1),
            "contrastive_train_gestures_per_sec": round(contrastive_per_sec, 1),
            # Where the time goes (B=512) and where the next 2x lives
            # (throughput vs batch size) — VERDICT r4 weak #6.
            "gestures_per_sec_per_chip_by_batch": batch_curve,
            "step_decomposition_b512": decomposition,
        },
    }))


if __name__ == "__main__":
    main()
