"""Fused whole-stack BiLSTM Pallas kernel (ops/bilstm_fused.py) vs the XLA
scan reference (models/layers.bilstm_apply) — run in interpret mode on the
CPU test mesh; the same kernel body executes compiled on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
from wordgesture_gan_tpu.models.gan import generator_apply
from wordgesture_gan_tpu.models.layers import bilstm_apply, bilstm_init
from wordgesture_gan_tpu.ops.bilstm_fused import fused_bilstm_available, fused_bilstm_fwd
from wordgesture_gan_tpu.train.state import init_gan_state


def _random_stack(key, in_dim, hidden, num_layers):
    return bilstm_init(key, in_dim, hidden, num_layers)


@pytest.mark.parametrize("num_layers", [1, 2, 4])
def test_fused_matches_xla_scan(num_layers):
    H, Z, B, L = 48, 32, 8, 16
    layers = _random_stack(jax.random.PRNGKey(0), 2 + Z, H, num_layers)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (B, L, 2)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(B, Z)), jnp.float32)

    ref = bilstm_apply(layers, x, H, static=z)
    out = fused_bilstm_fwd(layers, x, H, z, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_batch_padding():
    """Batch sizes that are not lane multiples are zero-padded and cropped."""
    H, Z, L = 16, 8, 12
    layers = _random_stack(jax.random.PRNGKey(2), 2 + Z, H, 2)
    rng = np.random.default_rng(3)
    for B in (1, 5, 128, 131):
        x = jnp.asarray(rng.uniform(-1, 1, (B, L, 2)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(B, Z)), jnp.float32)
        ref = bilstm_apply(layers, x, H, static=z)
        out = fused_bilstm_fwd(layers, x, H, z, dtype=jnp.float32, interpret=True)
        assert out.shape == (B, L, 2 * H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_bf16_close_to_fp32():
    """bf16 carried state with fp32 gates/accumulation stays within bf16
    rounding of the fp32 reference."""
    H, Z, B, L = 48, 32, 8, 32
    layers = _random_stack(jax.random.PRNGKey(4), 2 + Z, H, 2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (B, L, 2)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(B, Z)), jnp.float32)
    ref = bilstm_apply(layers, x, H, static=z)
    out = fused_bilstm_fwd(layers, x, H, z, dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), atol=0.05)


def test_generator_inference_flag_is_noop_off_tpu():
    """On the CPU test mesh the fused kernel is unavailable, so
    inference=True must produce bit-identical output via the XLA path —
    the exact contract the multichip dryrun and sharded tests rely on."""
    assert not fused_bilstm_available()
    config = ModelConfig(seq_length=16, gen_hidden_dim=8, gen_num_layers=2,
                         latent_dim=8, enc_hidden_dims=(16, 8),
                         disc_hidden_dims=(16, 8))
    state = init_gan_state(0, config, TrainingConfig())
    gp = state["g"]["params"]
    rng = np.random.default_rng(6)
    proto = jnp.asarray(rng.uniform(-1, 1, (4, 16, 3)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    a = generator_apply(gp, proto, z, config)
    b = generator_apply(gp, proto, z, config, inference=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
