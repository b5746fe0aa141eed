"""Fused two-cycle GAN train step tests: params update, losses finite,
spectral/RNG state advances, epoch scan works, and the sharded multi-device
path produces the same result as single-device (SURVEY.md §4c/§4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
from wordgesture_gan_tpu.parallel import batch_sharding, create_mesh, replicate, shard_batch
from wordgesture_gan_tpu.train import (
    cosine_annealing_lr,
    gan_train_epoch,
    gan_train_step,
    init_gan_state,
    make_epoch_batches,
)

# Tiny config: fast CPU compile, exercises every code path (temporal critic,
# 2-layer BiLSTM, n_critic=2).
MCFG = ModelConfig(seq_length=32, gen_hidden_dim=8, gen_num_layers=2, latent_dim=8,
                   enc_hidden_dims=(24, 16), disc_hidden_dims=(24, 16))
TCFG = TrainingConfig(batch_size=8, n_critic=2)
B = 8


@pytest.fixture(scope="module")
def state():
    return init_gan_state(jax.random.PRNGKey(0), MCFG, TCFG)


@pytest.fixture(scope="module")
def batch():
    k = jax.random.PRNGKey(42)
    kg, kp = jax.random.split(k)
    return {
        "gesture": jax.random.uniform(kg, (B, MCFG.seq_length, 3), minval=-1, maxval=1),
        "prototype": jax.random.uniform(kp, (B, MCFG.seq_length, 3), minval=-1, maxval=1),
    }


@pytest.fixture(scope="module")
def stepped(state, batch):
    step = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, MCFG, TCFG))
    return step(state, batch, jnp.float32(2e-4))


def test_all_params_update(state, stepped):
    new_state, _ = stepped
    for model in ("g", "e", "d1", "d2"):
        before = jax.tree.leaves(state[model]["params"])
        after = jax.tree.leaves(new_state[model]["params"])
        changed = sum(not np.allclose(a, b) for a, b in zip(before, after))
        assert changed > 0, f"{model} params did not update"


def test_metrics_finite_and_complete(stepped):
    _, metrics = stepped
    expected = {
        "d1_loss", "d2_loss",
        "cycle1_total", "cycle1_wgan", "cycle1_feat", "cycle1_lat",
        "cycle2_total", "cycle2_wgan", "cycle2_feat", "cycle2_rec", "cycle2_kld",
    }
    assert expected == set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_rng_and_sn_state_advance(state, stepped):
    new_state, _ = stepped
    assert not np.array_equal(state["rng"], new_state["rng"])
    sn_before = jax.tree.leaves(state["d1"]["sn"])
    sn_after = jax.tree.leaves(new_state["d1"]["sn"])
    assert any(not np.allclose(a, b) for a, b in zip(sn_before, sn_after))


def test_step_deterministic(state, batch):
    step = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, MCFG, TCFG))
    s1, m1 = step(state, batch, jnp.float32(2e-4))
    s2, m2 = step(state, batch, jnp.float32(2e-4))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_array_equal(a, b)


def test_epoch_scan(state):
    n, bsz = 24, 8
    k = jax.random.PRNGKey(7)
    g = jax.random.uniform(k, (n, MCFG.seq_length, 3), minval=-1, maxval=1)
    p = jax.random.uniform(k, (n, MCFG.seq_length, 3), minval=-1, maxval=1)
    batches = make_epoch_batches(jax.random.PRNGKey(1), g, p, bsz)
    assert batches["gesture"].shape == (3, bsz, MCFG.seq_length, 3)

    epoch = jax.jit(lambda s, eb, lr: gan_train_epoch(s, eb, lr, MCFG, TCFG))
    new_state, traces = epoch(state, batches, jnp.float32(2e-4))
    assert traces["d1_loss"].shape == (3,)
    assert int(new_state["epoch"]) == int(state["epoch"]) + 1
    assert np.isfinite(np.asarray(traces["cycle2_total"])).all()


def test_per_step_loop_matches_epoch_scan(state):
    """The production epoch strategy (RuntimeConfig.scan_epoch=False: host
    loop of jitted steps) must match the scanned epoch — same step function,
    same RNG threading, different dispatch. Two tiers: after ONE batch the
    paths must agree to fp-fusion noise (XLA compiles the scan body slightly
    differently from the isolated step, reordering float sums — this tight
    bound is the real equivalence check); across a 3-batch epoch the
    adversarial step amplifies that last-ulp noise (Adam + WGAN
    sign-sensitivity), so the final state is only checked loosely against
    gross divergences (wrong RNG threading, dropped update)."""
    n, bsz = 24, 8
    k = jax.random.PRNGKey(7)
    g = jax.random.uniform(k, (n, MCFG.seq_length, 3), minval=-1, maxval=1)
    p = jax.random.uniform(k, (n, MCFG.seq_length, 3), minval=-1, maxval=1)
    batches = make_epoch_batches(jax.random.PRNGKey(1), g, p, bsz)
    lr = jnp.float32(2e-4)

    epoch = jax.jit(lambda s, eb, lr: gan_train_epoch(s, eb, lr, MCFG, TCFG))
    step = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, MCFG, TCFG))

    # Tier 1: single batch, tight.
    one = {k_: v[:1] for k_, v in batches.items()}
    scanned1, traces1 = epoch(state, one, lr)
    stepped1, m1 = step(state, {"gesture": batches["gesture"][0],
                                "prototype": batches["prototype"][0]}, lr)
    for a, b in zip(jax.tree.leaves(scanned1),
                    jax.tree.leaves(dict(stepped1, epoch=stepped1["epoch"] + 1))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
    for k_ in traces1:
        np.testing.assert_allclose(np.asarray(traces1[k_][0]), np.asarray(m1[k_]),
                                   atol=1e-5, rtol=1e-4)

    # Tier 2: full 3-batch epoch, loose (chaotic amplification of fp noise).
    scanned_state, scanned_traces = epoch(state, batches, lr)
    s = state
    traces = []
    for i in range(batches["gesture"].shape[0]):
        s, m = step(s, {"gesture": batches["gesture"][i],
                        "prototype": batches["prototype"][i]}, lr)
        traces.append(m)

    for a, b in zip(jax.tree.leaves(scanned_state), jax.tree.leaves(dict(s, epoch=s["epoch"] + 1))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2)
    for k_ in scanned_traces:
        np.testing.assert_allclose(
            np.asarray(scanned_traces[k_]),
            np.asarray(jnp.stack([m[k_] for m in traces])), atol=1e-4, rtol=1e-2)


def test_n_critic_zero_skips_critics(state, batch):
    """n_critic=0 ablation: critics untouched, G/E still update (the
    reference's range(0) loop is simply skipped)."""
    tcfg = TrainingConfig(batch_size=8, n_critic=0)
    step = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, MCFG, tcfg))
    new_state, metrics = step(state, batch, jnp.float32(2e-4))
    for model in ("d1", "d2"):
        for a, b in zip(jax.tree.leaves(state[model]["params"]),
                        jax.tree.leaves(new_state[model]["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(metrics["d1_loss"]) == 0.0
    changed = sum(not np.allclose(a, b) for a, b in zip(
        jax.tree.leaves(state["g"]["params"]),
        jax.tree.leaves(new_state["g"]["params"])))
    assert changed > 0


def test_zero_batch_epoch_is_noop():
    """A dataset smaller than batch_size yields a 0-batch epoch: both epoch
    strategies must no-op with empty traces (torch drop_last semantics)."""
    from wordgesture_gan_tpu.configs import RuntimeConfig
    from wordgesture_gan_tpu.data.pipeline import GestureArrays
    from wordgesture_gan_tpu.train.gan_loop import train_gan

    n = 4  # < batch_size=8
    k = jax.random.PRNGKey(3)
    ds = GestureArrays(
        gestures=np.asarray(jax.random.uniform(k, (n, MCFG.seq_length, 3),
                                               minval=-1, maxval=1)),
        prototypes=np.asarray(jax.random.uniform(k, (n, MCFG.seq_length, 3),
                                                 minval=-1, maxval=1)),
        words=["ab"] * n,
    )
    for scan_epoch in (False, True):
        result = train_gan(
            ds, model_config=MCFG, training_config=TCFG,
            runtime_config=RuntimeConfig(scan_epoch=scan_epoch),
            num_epochs=1, verbose=False)
        assert len(result.history) == 1


def test_training_reduces_reconstruction(state, batch):
    """A few steps of the full two-cycle should reduce cycle-2 reconstruction
    (the strongest-weighted term, λ_rec=4)."""
    step = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, MCFG, TCFG))
    s = state
    first = last = None
    for i in range(30):
        s, m = step(s, batch, jnp.float32(1e-3))
        if i == 0:
            first = float(m["cycle2_rec"])
        last = float(m["cycle2_rec"])
    assert last < first


def test_cosine_lr_schedule():
    assert cosine_annealing_lr(2e-4, 0, 200) == pytest.approx(2e-4)
    assert cosine_annealing_lr(2e-4, 200, 200) == pytest.approx(1e-5)
    mid = cosine_annealing_lr(2e-4, 100, 200)
    assert mid == pytest.approx((2e-4 + 1e-5) / 2)


@pytest.mark.multichip
def test_sharded_step_matches_single_device(state, batch):
    """jit with NamedSharding over an 8-device CPU mesh must reproduce the
    single-device step bit-for-bit (same global semantics)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(8)

    step = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, MCFG, TCFG))
    ref_state, ref_metrics = step(state, batch, jnp.float32(2e-4))

    sharded_state = replicate(mesh, state)
    sharded_batch = shard_batch(mesh, batch, batch_axis=0)
    new_state, metrics = step(sharded_state, sharded_batch, jnp.float32(2e-4))

    # Cross-device reductions reorder float sums; Adam's rsqrt amplifies the
    # last-ulp differences, so compare to a few decimals, not bit-for-bit.
    for a, b in zip(jax.tree.leaves(ref_state), jax.tree.leaves(new_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    for k in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k]), float(metrics[k]), atol=1e-4)


def test_bf16_step_matches_fp32_closely(state, batch):
    """Mixed precision (ModelConfig.compute_dtype='bfloat16'): params stay
    fp32, every metric is finite and tracks the fp32 step to bf16 tolerance."""
    bf16_cfg = ModelConfig(**{**{f.name: getattr(MCFG, f.name)
                                 for f in __import__("dataclasses").fields(MCFG)},
                              "compute_dtype": "bfloat16"})
    step32 = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, MCFG, TCFG))
    step16 = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, bf16_cfg, TCFG))
    s32, m32 = step32(state, batch, jnp.float32(2e-4))
    s16, m16 = step16(state, batch, jnp.float32(2e-4))

    # Parameter/optimizer dtypes unchanged — bf16 is a compute view only.
    for leaf in jax.tree.leaves(s16):
        assert leaf.dtype != jnp.bfloat16

    for k in m32:
        a, b = float(m32[k]), float(m16[k])
        assert np.isfinite(b), k
        assert abs(a - b) <= 0.05 * max(1.0, abs(a)), (k, a, b)
