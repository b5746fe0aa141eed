"""Generator-variant tests: MLP and Transformer share the conditional
generator contract and train through the full two-cycle step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
from wordgesture_gan_tpu.models import generator_apply, generator_init
from wordgesture_gan_tpu.train import gan_train_step, init_gan_state

B = 4


def _cfg(gen_type, **kw):
    return ModelConfig(
        seq_length=32, latent_dim=8, enc_hidden_dims=(24, 16),
        disc_hidden_dims=(24, 16), gen_hidden_dim=8, gen_num_layers=2,
        mlp_gen_hidden_dims=(64, 64), tfm_d_model=16, tfm_num_heads=2,
        tfm_num_layers=2, generator_type=gen_type, **kw,
    )


@pytest.fixture(scope="module")
def inputs():
    k = jax.random.PRNGKey(0)
    kp, kz = jax.random.split(k)
    proto = jax.random.uniform(kp, (B, 32, 3), minval=-1, maxval=1)
    z = jax.random.normal(kz, (B, 8))
    return proto, z


@pytest.mark.parametrize("gen_type", ["mlp", "transformer"])
def test_variant_contract(inputs, gen_type):
    proto, z = inputs
    cfg = _cfg(gen_type)
    params = generator_init(jax.random.PRNGKey(1), cfg)
    out = jax.jit(lambda p, pr, zz: generator_apply(p, pr, zz, cfg))(params, proto, z)
    assert out.shape == (B, 32, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0
    # conditioned on z
    z2 = jax.random.normal(jax.random.PRNGKey(2), (B, 8))
    assert not np.allclose(out, generator_apply(params, proto, z2, cfg))
    # time channel of prototype ignored (prototype_has_time=False)
    out2 = generator_apply(params, proto.at[:, :, 2].add(0.3), z, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


@pytest.mark.parametrize("gen_type", ["mlp", "transformer"])
@pytest.mark.slow
def test_variant_trains_through_two_cycle_step(inputs, gen_type):
    proto, z = inputs
    mcfg = _cfg(gen_type)
    tcfg = TrainingConfig(batch_size=B, n_critic=1)
    state = init_gan_state(0, mcfg, tcfg)
    batch = {"gesture": proto, "prototype": proto}
    step = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, mcfg, tcfg))
    new_state, metrics = step(state, batch, jnp.float32(2e-4))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    changed = sum(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state["g"]["params"]),
                        jax.tree.leaves(new_state["g"]["params"]))
    )
    assert changed > 0


def test_transformer_pad_mask():
    from wordgesture_gan_tpu.models.generators import (
        transformer_generator_apply,
        transformer_generator_init,
    )

    cfg = _cfg("transformer")
    params = transformer_generator_init(jax.random.PRNGKey(3), cfg)
    proto = jax.random.uniform(jax.random.PRNGKey(4), (B, 32, 3))
    z = jax.random.normal(jax.random.PRNGKey(5), (B, 8))

    mask = jnp.ones((B, 32)).at[:, 16:].set(0)
    out_masked = transformer_generator_apply(params, proto, z, cfg, pad_mask=mask)
    # Changing padded-position inputs must not affect valid-position outputs.
    proto2 = proto.at[:, 20:, :].set(0.77)
    out_masked2 = transformer_generator_apply(params, proto2, z, cfg, pad_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_masked[:, :16]), np.asarray(out_masked2[:, :16]), atol=1e-5
    )
    # Without the mask they would differ.
    out_nomask = transformer_generator_apply(params, proto, z, cfg)
    out_nomask2 = transformer_generator_apply(params, proto2, z, cfg)
    assert not np.allclose(out_nomask[:, :16], out_nomask2[:, :16], atol=1e-5)


@pytest.mark.parametrize("gen_type", ["bilstm", "mlp", "transformer"])
def test_monotone_time_head(inputs, gen_type):
    """time_head='monotone': t starts at 0, ends at 1, strictly increases;
    xy stays in [-1, 1]; gradients flow into the time logits."""
    proto, z = inputs
    cfg = _cfg(gen_type, time_head="monotone")
    params = generator_init(jax.random.PRNGKey(1), cfg)
    out = np.asarray(generator_apply(params, proto, z, cfg))
    t = out[:, :, 2]
    np.testing.assert_allclose(t[:, 0], 0.0, atol=1e-7)
    np.testing.assert_allclose(t[:, -1], 1.0, atol=1e-5)
    assert (np.diff(t, axis=1) > 0).all(), "time must be strictly monotone"
    assert np.abs(out[:, :, :2]).max() <= 1.0

    # Same parameter pytree as the tanh head (mode is activation-only).
    tanh_params = generator_init(jax.random.PRNGKey(1), _cfg(gen_type))
    assert jax.tree.structure(params) == jax.tree.structure(tanh_params)

    # The time channel's value must carry gradient back to the parameters.
    def t_loss(p):
        g = generator_apply(p, proto, z, cfg)
        return (g[:, :, 2] ** 2).mean()

    grads = jax.grad(t_loss)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_masked_monotone_time_head(inputs):
    """Variable-length monotone clock: with a pad_mask the time channel
    spans 0→1 over the VALID segment (monotone within it, flat at 1 through
    padding), and an all-ones mask reproduces the unmasked head exactly."""
    from wordgesture_gan_tpu.models.generators import transformer_generator_apply

    proto, z = inputs
    cfg = _cfg("transformer", time_head="monotone")
    params = generator_init(jax.random.PRNGKey(1), cfg)

    n_valid = 20
    mask = jnp.ones((B, 32)).at[:, n_valid:].set(0)
    out = np.asarray(transformer_generator_apply(params, proto, z, cfg,
                                                 pad_mask=mask))
    t = out[:, :, 2]
    np.testing.assert_allclose(t[:, 0], 0.0, atol=1e-7)
    # The clock reaches 1 at the LAST VALID position, not at L-1 ...
    np.testing.assert_allclose(t[:, n_valid - 1], 1.0, atol=1e-5)
    assert (np.diff(t[:, :n_valid], axis=1) > 0).all()
    # ... and stays flat at 1 through padding (consumers mask it out).
    np.testing.assert_allclose(t[:, n_valid:], 1.0, atol=1e-5)

    # All-ones mask == no mask (the fixed-length head is a special case).
    ones = jnp.ones((B, 32))
    np.testing.assert_allclose(
        np.asarray(transformer_generator_apply(params, proto, z, cfg, pad_mask=ones)),
        np.asarray(transformer_generator_apply(params, proto, z, cfg)),
        atol=1e-6)


def test_monotone_head_trains_through_two_cycle_step(inputs):
    proto, z = inputs
    mcfg = _cfg("bilstm", time_head="monotone")
    tcfg = TrainingConfig(batch_size=B, n_critic=1)
    state = init_gan_state(0, mcfg, tcfg)
    # A plausible gesture batch: monotone time channel like real data.
    t = jnp.broadcast_to(jnp.linspace(0, 1, 32), (B, 32))
    gesture = jnp.concatenate([proto[:, :, :2], t[:, :, None]], axis=-1)
    batch = {"gesture": gesture, "prototype": proto}
    step = jax.jit(lambda s, b, lr: gan_train_step(s, b, lr, mcfg, tcfg))
    new_state, metrics = step(state, batch, jnp.float32(2e-4))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
