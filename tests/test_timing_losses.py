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
from wordgesture_gan_tpu.losses import (
    diversity_hinge_loss,
    masked_speed_profile_loss,
    masked_time_delta_corr_loss,
    masked_time_delta_loss,
    mode_seeking_loss,
    speed_profile_loss,
    time_delta_corr_loss,
    time_delta_loss,
)
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


def test_dt_corr_loss_matches_metric_direction():
    """time_delta_corr_loss is 1 − the (unclipped) time-delta-correlation
    metric on valid rows: ~0 for identical Δt patterns, ~2 for anti-phase."""
    from wordgesture_gan_tpu.ops.stats import time_delta_correlation

    g = _gesture_batch(jax.random.PRNGKey(6))
    assert float(time_delta_corr_loss(g, g)) == pytest.approx(0.0, abs=1e-5)

    f = _gesture_batch(jax.random.PRNGKey(7))
    loss = float(time_delta_corr_loss(g, f))
    metric = float(time_delta_correlation(g, f))
    assert loss == pytest.approx(1.0 - metric, abs=1e-4)
    grad = jax.grad(lambda x: time_delta_corr_loss(g, x))(f)
    assert np.all(np.isfinite(np.asarray(grad)))


def test_mode_seeking_loss_prefers_diversity():
    """Collapsed outputs (identical fakes for distinct z) cost ~1/eps; diverse
    outputs cost little; no gradient flows into the latent inputs."""
    key = jax.random.PRNGKey(8)
    kz1, kz2, kf = jax.random.split(key, 3)
    z1 = jax.random.normal(kz1, (4, 8))
    z2 = jax.random.normal(kz2, (4, 8))
    fake = _gesture_batch(kf)

    collapsed = float(mode_seeking_loss(fake, fake, z1, z2))
    diverse = float(mode_seeking_loss(fake, _gesture_batch(jax.random.PRNGKey(9)), z1, z2))
    assert collapsed > 100.0 * diverse

    # stop_gradient on the latent distance: z grads must be exactly zero.
    gz = jax.grad(lambda z: mode_seeking_loss(fake, fake + 0.1, z, z2))(z1)
    assert np.all(np.asarray(gz) == 0.0)
    gf = jax.grad(lambda f: mode_seeking_loss(f, fake + 0.1, z1, z2))(fake)
    assert np.all(np.isfinite(np.asarray(gf)))


def test_masked_losses_match_fixed_on_all_valid():
    """On an all-ones mask the masked twins equal the fixed-length losses
    (time_delta_loss's (L-1)·mean IS the per-row sum the masked twin keeps)."""
    g = _gesture_batch(jax.random.PRNGKey(20))
    f = _gesture_batch(jax.random.PRNGKey(21))
    mask = jnp.ones(g.shape[:2])
    assert float(masked_time_delta_loss(g, f, mask)) == pytest.approx(
        float(time_delta_loss(g, f)), rel=1e-5)
    assert float(masked_speed_profile_loss(g, f, mask)) == pytest.approx(
        float(speed_profile_loss(g, f)), rel=1e-4)
    assert float(masked_time_delta_corr_loss(g, f, mask)) == pytest.approx(
        float(time_delta_corr_loss(g, f)), rel=1e-4)


def test_masked_losses_ignore_padding():
    """Corrupting the padded tail must not change the loss, and gradients
    w.r.t. padded positions must be exactly zero."""
    g = _gesture_batch(jax.random.PRNGKey(22))
    f = _gesture_batch(jax.random.PRNGKey(23))
    L = g.shape[1]
    valid = L - 10
    mask = jnp.concatenate(
        [jnp.ones((g.shape[0], valid)), jnp.zeros((g.shape[0], 10))], axis=1)
    junk = f.at[:, valid:, :].set(99.0)

    for fn in (masked_time_delta_loss, masked_speed_profile_loss,
               masked_time_delta_corr_loss):
        clean = float(fn(g, f, mask))
        assert float(fn(g, junk, mask)) == pytest.approx(clean, rel=1e-5), fn
        grad = np.asarray(jax.grad(lambda x: fn(g, x, mask))(junk))
        assert np.all(np.isfinite(grad))
        # Padded-tail gradient dead beyond the boundary segment.
        assert np.all(grad[:, valid:, :] == 0.0), fn


def test_masked_step_accepts_timing_lambdas():
    from wordgesture_gan_tpu.train.masked_step import gan_train_step_masked

    mcfg = ModelConfig(seq_length=32, latent_dim=8, enc_hidden_dims=(24, 16),
                       disc_hidden_dims=(24, 16), generator_type="transformer",
                       tfm_d_model=16, tfm_num_heads=2, tfm_num_layers=2)
    tcfg = TrainingConfig(batch_size=4, n_critic=1,
                          lambda_dt=2.0, lambda_speed=1.0, lambda_dtc=1.0)
    state = init_gan_state(jax.random.PRNGKey(0), mcfg, tcfg)
    mask = jnp.concatenate([jnp.ones((4, 24)), jnp.zeros((4, 8))], axis=1)
    batch = {"gesture": _gesture_batch(jax.random.PRNGKey(24), n=4, L=32),
             "prototype": _gesture_batch(jax.random.PRNGKey(25), n=4, L=32),
             "mask": mask}
    new_state, metrics = jax.jit(
        lambda s, b: gan_train_step_masked(s, b, jnp.float32(2e-4), mcfg, tcfg)
    )(state, batch)
    assert np.isfinite(float(metrics["cycle2_total"]))
    leaf0 = jax.tree_util.tree_leaves(state["g"]["params"])[0]
    leaf1 = jax.tree_util.tree_leaves(new_state["g"]["params"])[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


def test_diversity_hinge_loss_shuts_off_past_margin():
    """Pairs closer than the margin pay (scale-free in the margin); pairs at
    or beyond it pay exactly zero — no incentive to scribble past the data's
    own conditional diversity, unlike the MSGAN ratio."""
    fake = _gesture_batch(jax.random.PRNGKey(12))
    margin = 0.2

    collapsed = float(diversity_hinge_loss(fake, fake, margin))
    assert collapsed == pytest.approx(1.0, abs=1e-6)   # relu(m-0)/m = 1

    # A pair separated by exactly the margin (uniform offset) costs zero…
    apart = fake + margin
    assert float(diversity_hinge_loss(fake, apart, margin)) == pytest.approx(0.0, abs=1e-6)
    # …and so does any wider separation (the hinge is off, gradient dead).
    far = fake + 10 * margin
    assert float(diversity_hinge_loss(fake, far, margin)) == 0.0
    g = jax.grad(lambda f: diversity_hinge_loss(f, far, margin))(fake)
    assert np.all(np.asarray(g) == 0.0)

    # Inside the margin the gradient pushes the pair APART and is finite.
    near = fake + 0.1 * margin
    g = jax.grad(lambda f: diversity_hinge_loss(f, near, margin))(fake)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0.0


def test_within_word_diversity_measures_spread():
    """The data-driven margin: mean within-word L1 over sampled pairs."""
    from wordgesture_gan_tpu.data.pipeline import GestureArrays, within_word_diversity

    rng = np.random.default_rng(0)
    base = rng.normal(size=(2, 16, 3)).astype(np.float32)
    # Two words, three gestures each, word-0 spread 0, word-1 spread > 0.
    gestures = np.stack([base[0], base[0], base[0],
                         base[1], base[1] + 0.5, base[1] - 0.5]).astype(np.float32)
    protos = np.zeros_like(gestures)
    ds = GestureArrays(gestures, protos, ["aa", "aa", "aa", "bb", "bb", "bb"])
    m = within_word_diversity(ds, max_pairs_per_word=3, seed=0)
    assert 0.0 < m < 1.0   # word-0 contributes zeros, word-1 ~0.5-ish L1s

    # Singleton-only corpora cannot define a margin.
    solo = GestureArrays(gestures[:2], protos[:2], ["aa", "bb"])
    with pytest.raises(ValueError):
        within_word_diversity(solo)


def test_step_accepts_div_lambda():
    mcfg = ModelConfig(seq_length=32, gen_hidden_dim=8, gen_num_layers=2,
                       latent_dim=8, enc_hidden_dims=(24, 16),
                       disc_hidden_dims=(24, 16), time_head="monotone")
    tcfg = TrainingConfig(batch_size=4, n_critic=1, lambda_div=1.0, div_margin=0.3)
    state = init_gan_state(jax.random.PRNGKey(0), mcfg, tcfg)
    batch = {"gesture": _gesture_batch(jax.random.PRNGKey(10), n=4, L=32),
             "prototype": _gesture_batch(jax.random.PRNGKey(11), n=4, L=32)}
    new_state, metrics = jax.jit(
        lambda s, b: gan_train_step(s, b, jnp.float32(2e-4), mcfg, tcfg)
    )(state, batch)
    assert np.isfinite(float(metrics["cycle1_total"]))
    leaf0 = jax.tree_util.tree_leaves(state["g"]["params"])[0]
    leaf1 = jax.tree_util.tree_leaves(new_state["g"]["params"])[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))

    # Unmeasured margin must be a loud error, not a silent miscompile.
    bad = TrainingConfig(batch_size=4, n_critic=1, lambda_div=1.0)
    with pytest.raises(ValueError, match="div_margin"):
        gan_train_step(state, batch, jnp.float32(2e-4), mcfg, bad)


def test_step_accepts_ms_and_dtc_lambdas():
    mcfg = ModelConfig(seq_length=32, gen_hidden_dim=8, gen_num_layers=2,
                       latent_dim=8, enc_hidden_dims=(24, 16),
                       disc_hidden_dims=(24, 16), time_head="monotone")
    tcfg = TrainingConfig(batch_size=4, n_critic=1, lambda_ms=1.0, lambda_dtc=2.0)
    state = init_gan_state(jax.random.PRNGKey(0), mcfg, tcfg)
    batch = {"gesture": _gesture_batch(jax.random.PRNGKey(10), n=4, L=32),
             "prototype": _gesture_batch(jax.random.PRNGKey(11), n=4, L=32)}
    new_state, metrics = jax.jit(
        lambda s, b: gan_train_step(s, b, jnp.float32(2e-4), mcfg, tcfg)
    )(state, batch)
    assert np.isfinite(float(metrics["cycle1_total"]))
    assert np.isfinite(float(metrics["cycle2_total"]))
    leaf0 = jax.tree_util.tree_leaves(state["g"]["params"])[0]
    leaf1 = jax.tree_util.tree_leaves(new_state["g"]["params"])[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))


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
