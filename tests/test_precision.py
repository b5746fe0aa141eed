"""Mixed-precision (bf16 compute view) coverage across model families and
eval-path numerics: every generator variant, both critics, the encoder, and
the FID nonnegativity clamp."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wordgesture_gan_tpu.configs import ModelConfig
from wordgesture_gan_tpu.models.gan import (
    disc_apply,
    disc_init,
    encoder_apply,
    encoder_init,
    generator_apply,
    generator_init,
)

BASE = ModelConfig(seq_length=32, gen_hidden_dim=8, gen_num_layers=2, latent_dim=8,
                   enc_hidden_dims=(24, 16), disc_hidden_dims=(24, 16),
                   tfm_d_model=16, tfm_num_heads=2, tfm_num_layers=2)


def _with(cfg: ModelConfig, **kw) -> ModelConfig:
    return dataclasses.replace(cfg, **kw)


@pytest.mark.parametrize("family", ["bilstm", "mlp", "transformer"])
def test_bf16_generator_tracks_fp32(family):
    """Each generator family under compute_dtype=bfloat16: output is fp32,
    finite, and close to the fp32 forward (same params)."""
    cfg32 = _with(BASE, generator_type=family)
    cfg16 = _with(cfg32, compute_dtype="bfloat16")
    params = generator_init(jax.random.PRNGKey(0), cfg32)
    proto = jax.random.uniform(jax.random.PRNGKey(1), (4, cfg32.seq_length, 3),
                               minval=-1, maxval=1)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, cfg32.latent_dim))

    out32 = generator_apply(params, proto, z, cfg32)
    out16 = generator_apply(params, proto, z, cfg16)
    assert out16.dtype == jnp.float32
    assert np.isfinite(np.asarray(out16)).all()
    # tanh output in [-1,1]: absolute bf16 tolerance
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=0.04)


@pytest.mark.parametrize("temporal", [True, False])
def test_bf16_critic_tracks_fp32(temporal):
    cfg32 = _with(BASE, use_temporal_disc=temporal)
    cfg16 = _with(cfg32, compute_dtype="bfloat16")
    params, sn = disc_init(jax.random.PRNGKey(0), cfg32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, cfg32.seq_length, 3),
                           minval=-1, maxval=1)
    s32, f32, _ = disc_apply(params, sn, x, False, cfg32)
    s16, f16, _ = disc_apply(params, sn, x, False, cfg16)
    assert s16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32),
                               atol=0.05 * max(1.0, float(jnp.abs(s32).max())))
    assert len(f16) == len(f32)


def test_bf16_encoder_heads_stay_fp32():
    cfg16 = _with(BASE, compute_dtype="bfloat16")
    params = encoder_init(jax.random.PRNGKey(0), cfg16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, cfg16.seq_length, 3),
                           minval=-1, maxval=1)
    z, mu, log_var = encoder_apply(params, x, jax.random.PRNGKey(2), cfg16)
    for a in (z, mu, log_var):
        assert a.dtype == jnp.float32
        assert np.isfinite(np.asarray(a)).all()


def test_fid_nonnegative_for_identical_features():
    """Near-identical feature sets used to produce a (tiny) negative FID via
    the eigh-trace overshoot; the clamp guarantees >= 0."""
    from wordgesture_gan_tpu.metrics.fid import fid_from_features

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(500, 32)), jnp.float32)
    assert fid_from_features(feats, feats) >= 0.0
    jitter = feats + jnp.asarray(rng.normal(0, 1e-5, (500, 32)), jnp.float32)
    assert fid_from_features(feats, jitter) >= 0.0
