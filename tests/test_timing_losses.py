"""Timing-dynamics auxiliary losses (losses.time_delta_loss /
speed_profile_loss): zero at identity, positive and finite-gradient
otherwise, and the fused step accepts nonzero lambdas (repo addition — the
terms that supervise the tempo warp the reference's correlation metrics
measure, /root/reference/src/gan/evaluation.py:157-294)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
from wordgesture_gan_tpu.losses import speed_profile_loss, time_delta_loss
from wordgesture_gan_tpu.train import gan_train_step, init_gan_state


def _gesture_batch(key, n=4, L=32):
    """Synthetic (n, L, 3) gestures: smooth xy in [-1,1], monotone t in [0,1]."""
    kx, kt = jax.random.split(key)
    xy = jnp.cumsum(jax.random.normal(kx, (n, L, 2)) * 0.05, axis=1)
    xy = jnp.clip(xy, -1, 1)
    inc = jax.nn.softmax(jax.random.normal(kt, (n, L - 1)), axis=-1)
    t = jnp.concatenate([jnp.zeros((n, 1)), jnp.cumsum(inc, axis=1)], axis=1)
    return jnp.concatenate([xy, t[..., None]], axis=-1)


def test_zero_at_identity():
    g = _gesture_batch(jax.random.PRNGKey(0))
    assert float(time_delta_loss(g, g)) == pytest.approx(0.0, abs=1e-6)
    assert float(speed_profile_loss(g, g)) == pytest.approx(0.0, abs=1e-4)


def test_positive_on_mismatch_and_scale():
    g = _gesture_batch(jax.random.PRNGKey(1))
    # Uniform-clock fake with the same geometry: only the t pattern differs.
    L = g.shape[1]
    uniform_t = jnp.broadcast_to(jnp.linspace(0, 1, L), g.shape[:2])
    f = g.at[:, :, 2].set(uniform_t)
    dt = float(time_delta_loss(g, f))
    sp = float(speed_profile_loss(g, f))
    assert dt > 0.05          # (L-1)-scaled: O(1) for a real warp mismatch
    assert 0.0 < sp <= 2.0    # 1 - corr is bounded by [0, 2]


def test_gradients_finite():
    g = _gesture_batch(jax.random.PRNGKey(2))
    f = _gesture_batch(jax.random.PRNGKey(3))

    for fn in (time_delta_loss, speed_profile_loss):
        grad = jax.grad(lambda x: fn(g, x))(f)
        assert np.all(np.isfinite(np.asarray(grad)))

    # Pause segments (dt == 0) must not produce NaNs through the 1/dt.
    f0 = f.at[:, 10:14, 2].set(f[:, 10:11, 2])
    grad = jax.grad(lambda x: speed_profile_loss(g, x))(f0)
    assert np.all(np.isfinite(np.asarray(grad)))


def test_step_accepts_timing_lambdas():
    mcfg = ModelConfig(seq_length=32, gen_hidden_dim=8, gen_num_layers=2,
                       latent_dim=8, enc_hidden_dims=(24, 16),
                       disc_hidden_dims=(24, 16), time_head="monotone")
    tcfg = TrainingConfig(batch_size=4, n_critic=1, lambda_dt=4.0, lambda_speed=0.5)
    state = init_gan_state(jax.random.PRNGKey(0), mcfg, tcfg)
    batch = {"gesture": _gesture_batch(jax.random.PRNGKey(4), n=4, L=32),
             "prototype": _gesture_batch(jax.random.PRNGKey(5), n=4, L=32)}
    new_state, metrics = jax.jit(
        lambda s, b: gan_train_step(s, b, jnp.float32(2e-4), mcfg, tcfg)
    )(state, batch)
    assert np.isfinite(float(metrics["cycle2_total"]))
    # Generator params actually moved.
    leaf0 = jax.tree_util.tree_leaves(state["g"]["params"])[0]
    leaf1 = jax.tree_util.tree_leaves(new_state["g"]["params"])[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
