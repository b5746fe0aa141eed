"""Model shape / finiteness / gradient tests under jit (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wordgesture_gan_tpu.configs import ContrastiveConfig, ModelConfig
from wordgesture_gan_tpu.models import (
    autoencoder_apply,
    autoencoder_encode,
    autoencoder_init,
    contrastive_encoder_apply,
    contrastive_encoder_init,
    disc_apply,
    disc_init,
    encoder_apply,
    encoder_init,
    generator_apply,
    generator_init,
    mlp_disc_apply,
    mlp_disc_init,
    temporal_disc_apply,
    temporal_disc_init,
)

# Small config for jit-heavy tests (CPU compile time); topology tests use the
# full default config without jit.
CFG = ModelConfig(seq_length=32, gen_hidden_dim=16, gen_num_layers=2,
                  latent_dim=8, enc_hidden_dims=(48, 24), disc_hidden_dims=(48, 24))
B = 4


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def batch(key):
    kg, kp = jax.random.split(key)
    gesture = jax.random.uniform(kg, (B, CFG.seq_length, 3), minval=-1, maxval=1)
    proto = jax.random.uniform(kp, (B, CFG.seq_length, 3), minval=-1, maxval=1)
    return gesture, proto


def test_encoder_shapes(key, batch):
    gesture, _ = batch
    params = encoder_init(key, CFG)
    z, mu, log_var = jax.jit(encoder_apply)(params, gesture, jax.random.PRNGKey(1))
    assert z.shape == mu.shape == log_var.shape == (B, CFG.latent_dim)
    assert np.isfinite(np.asarray(z)).all()
    # reparameterization: different rng → different z, same mu
    z2, mu2, _ = encoder_apply(params, gesture, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(mu, mu2)
    assert not np.allclose(z, z2)


def test_generator_shapes_and_range(key, batch):
    gesture, proto = batch
    params = generator_init(key, CFG)
    z = jax.random.normal(jax.random.PRNGKey(3), (B, CFG.latent_dim))
    out = jax.jit(lambda p, pr, z: generator_apply(p, pr, z, CFG))(params, proto, z)
    assert out.shape == (B, CFG.seq_length, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh head
    # latent conditioning: different z → different gesture
    z2 = jax.random.normal(jax.random.PRNGKey(4), (B, CFG.latent_dim))
    out2 = generator_apply(params, proto, z2, CFG)
    assert not np.allclose(out, out2)


def test_generator_ignores_prototype_time_channel(key, batch):
    _, proto = batch
    params = generator_init(key, CFG)
    z = jax.random.normal(jax.random.PRNGKey(3), (B, CFG.latent_dim))
    proto_perturbed = proto.at[:, :, 2].add(0.5)
    out1 = generator_apply(params, proto, z, CFG)
    out2 = generator_apply(params, proto_perturbed, z, CFG)
    np.testing.assert_array_equal(out1, out2)


@pytest.mark.parametrize("init_fn,apply_fn,n_feats", [
    (mlp_disc_init, mlp_disc_apply, len(CFG.disc_hidden_dims)),
    (temporal_disc_init, temporal_disc_apply, 5),  # 3 convs + 2 MLP taps
])
def test_discriminators(key, batch, init_fn, apply_fn, n_feats):
    gesture, _ = batch
    params, sn = init_fn(key, CFG)
    scores, feats, sn_new = jax.jit(lambda p, s, x: apply_fn(p, s, x, True))(params, sn, gesture)
    assert scores.shape == (B, 1)
    assert len(feats) == n_feats
    assert all(f.shape[0] == B for f in feats)
    # power iteration advanced
    changed = jax.tree.map(lambda a, b: not np.allclose(a, b), sn, sn_new)
    assert any(jax.tree.leaves(changed))
    # eval mode: state unchanged
    _, _, sn_same = apply_fn(params, sn, gesture, False)
    for a, b in zip(jax.tree.leaves(sn), jax.tree.leaves(sn_same)):
        np.testing.assert_array_equal(a, b)


def test_spectral_norm_bounds_lipschitz(key):
    """After normalization the weight's top singular value should be ~1."""
    from wordgesture_gan_tpu.models.layers import spectral_init, spectral_normalize
    w = jax.random.normal(key, (64, 32)) * 3.0
    u = spectral_init(jax.random.PRNGKey(1), (64, 32))
    for _ in range(30):
        w_sn, u = spectral_normalize(w, u, True)
    sv = np.linalg.svd(np.asarray(w_sn), compute_uv=False)
    assert sv[0] == pytest.approx(1.0, abs=2e-2)


def test_batched_spectral_normalize_matches_per_layer(key):
    """The batched power iteration (zero-padded stacked layers, one set of
    contractions) must reproduce the per-layer reference — normalized
    weights, new u state, update=False mode, and gradients through σ."""
    from wordgesture_gan_tpu.models.layers import (
        batched_spectral_normalize,
        spectral_init,
        spectral_normalize,
    )

    shapes = [(15, 64), (320, 64), (192, 32), (256, 128), (128, 64), (64, 1)]
    keys = jax.random.split(key, len(shapes))
    ws = [jax.random.normal(k, s) * 0.8 for k, s in zip(keys, shapes)]
    us = [spectral_init(jax.random.fold_in(k, 1), s) for k, s in zip(keys, shapes)]

    for update in (True, False):
        ws_b, us_b = batched_spectral_normalize(ws, us, update)
        for w, u, wb, ub in zip(ws, us, ws_b, us_b):
            w_ref, u_ref = spectral_normalize(w, u, update)
            np.testing.assert_allclose(np.asarray(wb), np.asarray(w_ref),
                                       rtol=2e-6, atol=2e-6)
            np.testing.assert_allclose(np.asarray(ub), np.asarray(u_ref),
                                       rtol=2e-6, atol=2e-6)

    # Gradient through σ (stop-gradient'd u/v, live W) must also agree.
    def loss_batched(ws):
        out, _ = batched_spectral_normalize(ws, us, True)
        return sum(jnp.sum(jnp.sin(w)) for w in out)

    def loss_ref(ws):
        return sum(jnp.sum(jnp.sin(spectral_normalize(w, u, True)[0]))
                   for w, u in zip(ws, us))

    g_b = jax.grad(loss_batched)(ws)
    g_r = jax.grad(loss_ref)(ws)
    for a, b in zip(g_b, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_autoencoder(key, batch):
    gesture, _ = batch
    params = autoencoder_init(key, CFG, hidden_dim=32)
    recon = jax.jit(autoencoder_apply)(params, gesture)
    assert recon.shape == gesture.shape
    feats = autoencoder_encode(params, gesture)
    assert feats.shape == (B, 32)


def test_contrastive_encoder(key, batch):
    gesture, _ = batch
    cfg = ContrastiveConfig()
    params, state = contrastive_encoder_init(key, cfg)
    emb, new_state = jax.jit(lambda p, s, x: contrastive_encoder_apply(p, s, x, True))(
        params, state, gesture
    )
    assert emb.shape == (B, cfg.embedding_dim)
    # L2 normalized
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # batchnorm stats updated in train mode
    assert not np.allclose(state["bns"][0]["mean"], new_state["bns"][0]["mean"])
    # eval mode: stats untouched
    _, same_state = contrastive_encoder_apply(params, state, gesture, False)
    np.testing.assert_array_equal(state["bns"][0]["mean"], same_state["bns"][0]["mean"])


def test_gradients_flow_everywhere(key, batch):
    gesture, proto = batch
    g = generator_init(key, CFG)
    z = jax.random.normal(jax.random.PRNGKey(5), (B, CFG.latent_dim))

    def loss(params):
        return jnp.abs(generator_apply(params, proto, z, CFG) - gesture).mean()

    grads = jax.grad(loss)(g)
    norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) >= len(norms) - 2  # nearly all params touched


def test_param_counts_match_reference_architecture(key):
    """Layer dims must reproduce the reference topology (models.py)."""
    from wordgesture_gan_tpu.train.state import init_gan_state, param_count
    state = init_gan_state(key)
    counts = param_count(state)
    # Generator: BiLSTM(34→48×4 bidir) + Linear(96→3)
    H, I = 48, 34
    layer0 = 2 * (4 * H * (I + H) + 8 * H)
    layerN = 2 * (4 * H * (2 * H + H) + 8 * H)
    expected_g = layer0 + 3 * layerN + (96 * 3 + 3)
    assert counts["g"] == expected_g
    # Encoder: 384→192→96→48→32 + two 32-dim heads
    dims = [384, 192, 96, 48, 32]
    expected_e = sum(a * b + b for a, b in zip(dims[:-1], dims[1:])) + 2 * (32 * 32 + 32)
    assert counts["e"] == expected_e
    # Temporal critic: convs 3→64(k5), 64→64(k5), 64→32(k3), mlp 256→128→64→1
    expected_d = (
        (3 * 5 * 64 + 64) + (64 * 5 * 64 + 64) + (64 * 3 * 32 + 32)
        + (256 * 128 + 128) + (128 * 64 + 64) + (64 * 1 + 1)
    )
    assert counts["d1"] == counts["d2"] == expected_d
