"""Fused BiLSTM training kernels (ops/bilstm_train.py): forward + custom_vjp
backward-through-time vs jax.grad of the XLA scan reference, in interpret
mode on the CPU test mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from wordgesture_gan_tpu.models.layers import bilstm_apply, bilstm_init
from wordgesture_gan_tpu.ops.bilstm_train import bilstm_train_apply


def _setup(num_layers, H=8, Z=4, B=6, L=10, seed=0):
    layers = bilstm_init(jax.random.PRNGKey(seed), 2 + Z, H, num_layers)
    rng = np.random.default_rng(seed + 1)
    x = jnp.asarray(rng.uniform(-1, 1, (B, L, 2)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(B, Z)), jnp.float32)
    return layers, x, z, H


@pytest.mark.parametrize("num_layers", [1, 2, 4])
def test_train_forward_matches_scan(num_layers):
    layers, x, z, H = _setup(num_layers)
    ref = bilstm_apply(layers, x, H, static=z)
    out = bilstm_train_apply(layers, x, z, H, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("num_layers", [1, 2, 4])
def test_train_grads_match_scan(num_layers):
    """Every weight gradient, the bias gradients, the static-z gradient, AND
    the sequence-input (prototype) gradient must match jax.grad of the XLA
    scan."""
    layers, x, z, H = _setup(num_layers)
    rng = np.random.default_rng(9)
    dy = jnp.asarray(rng.normal(size=(x.shape[0], x.shape[1], 2 * H)), jnp.float32)

    def loss_ref(layers, x, z):
        return jnp.sum(bilstm_apply(layers, x, H, static=z) * dy)

    def loss_fused(layers, x, z):
        return jnp.sum(
            bilstm_train_apply(layers, x, z, H, dtype=jnp.float32, interpret=True) * dy)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(layers, x, z)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(layers, x, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_train_grads_odd_seq_len():
    """Odd L exercises the middle sweep step (t == p) where both input-
    gradient contributions land on the same accumulator row in one
    iteration (dxf assigns, dxb adds)."""
    layers, x, z, H = _setup(2, B=4, L=9, seed=5)
    rng = np.random.default_rng(15)
    dy = jnp.asarray(rng.normal(size=(4, 9, 2 * H)), jnp.float32)

    def loss_ref(layers, x, z):
        return jnp.sum(bilstm_apply(layers, x, H, static=z) * dy)

    def loss_fused(layers, x, z):
        return jnp.sum(
            bilstm_train_apply(layers, x, z, H, dtype=jnp.float32, interpret=True) * dy)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(layers, x, z)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(layers, x, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_train_grads_batch_padding():
    """Lane padding must not leak into the gradients (padded lanes carry
    zero cotangent)."""
    layers, x, z, H = _setup(2, B=3, L=8)
    rng = np.random.default_rng(11)
    dy = jnp.asarray(rng.normal(size=(3, 8, 2 * H)), jnp.float32)

    def loss_ref(layers, z):
        return jnp.sum(bilstm_apply(layers, x, H, static=z) * dy)

    def loss_fused(layers, z):
        return jnp.sum(
            bilstm_train_apply(layers, x, z, H, dtype=jnp.float32, interpret=True) * dy)

    gr = jax.grad(loss_ref, argnums=(0, 1))(layers, z)
    gf = jax.grad(loss_fused, argnums=(0, 1))(layers, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
    assert gf[1].shape == z.shape


def test_train_bf16_grads_close():
    """bf16 compute with fp32 gradient accumulation stays within bf16
    rounding of the fp32 reference gradients."""
    layers, x, z, H = _setup(2, B=6, L=12, seed=3)
    rng = np.random.default_rng(13)
    dy = jnp.asarray(rng.normal(size=(6, 12, 2 * H)), jnp.float32)

    def loss_ref(layers, z):
        return jnp.sum(bilstm_apply(layers, x, H, static=z) * dy)

    def loss_fused(layers, z):
        return jnp.sum(
            bilstm_train_apply(layers, x, z, H, dtype=jnp.bfloat16, interpret=True) * dy)

    gr = jax.grad(loss_ref, argnums=(0, 1))(layers, z)
    gf = jax.grad(loss_fused, argnums=(0, 1))(layers, z)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gf)):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0.05 * scale)
