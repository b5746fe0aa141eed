"""The fused Pallas critic-update kernel (ops/critic_fused.py) must
reproduce jax.value_and_grad of the XLA disc_apply loss — loss, every
weight/bias gradient, and the new spectral-norm state — for both
power-iteration schedules, in f32 and bf16 (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wordgesture_gan_tpu.configs import ModelConfig
from wordgesture_gan_tpu.losses import wgan_critic_loss
from wordgesture_gan_tpu.models.gan import _POOL_BINS, _TCONV_SPEC, disc_apply, disc_init
from wordgesture_gan_tpu.ops.critic_fused import critic_temporal_loss_and_grads

# Thorough interpreter-mode kernel validation (~40 s) — slow tier; the
# batched-spectral-norm equivalence test in test_models.py covers the
# shared sn math in the smoke tier.
pytestmark = pytest.mark.slow

B, L = 8, 32


def _setup(dtype_name):
    cfg = ModelConfig(seq_length=L, use_temporal_disc=True, compute_dtype=dtype_name)
    params, sn = disc_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    real = jnp.asarray(rng.uniform(-1, 1, (B, L, 3)), jnp.float32)
    fake = jnp.asarray(rng.uniform(-1, 1, (B, L, 3)), jnp.float32)
    return cfg, params, sn, real, fake


def _xla_reference(cfg, params, sn, real, fake, fused):
    """The autodiff path from train/gan_step._critic_update."""

    def loss_fn(p, s):
        if fused:
            scores, _, s = disc_apply(p, s, jnp.concatenate([real, fake]), True, cfg)
            rs, fs = scores[:B], scores[B:]
        else:
            rs, _, s = disc_apply(p, s, real, True, cfg)
            fs, _, s = disc_apply(p, s, fake, True, cfg)
        return wgan_critic_loss(rs, fs), s

    (loss, new_sn), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, sn)
    return loss, grads, new_sn


@pytest.mark.parametrize("fused", [False, True], ids=["ref-schedule", "fused"])
def test_kernel_matches_xla_autodiff_f32(fused):
    cfg, params, sn, real, fake = _setup("float32")
    ref_loss, ref_grads, ref_sn = _xla_reference(cfg, params, sn, real, fake, fused)
    loss, grads, new_sn = critic_temporal_loss_and_grads(
        params, sn, real, fake, _TCONV_SPEC, _POOL_BINS, fused,
        jnp.float32, interpret=True)

    tol = 2e-5
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=tol, atol=tol)
    for ref_leaf, leaf in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(grads)):
        r = np.asarray(ref_leaf, np.float32)
        scale = max(1e-3, float(np.abs(r).max()))
        np.testing.assert_allclose(np.asarray(leaf, np.float32), r,
                                   atol=tol * scale, rtol=tol,
                                   err_msg=f"grad leaf shape {r.shape}")
    for ref_leaf, leaf in zip(jax.tree.leaves(ref_sn), jax.tree.leaves(new_sn)):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref_leaf),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("fused", [False, True], ids=["ref-schedule", "fused"])
def test_kernel_bf16_within_xla_bf16_noise_band(fused):
    """Under mixed precision the two bf16 paths place f32-vs-bf16
    accumulation boundaries differently (e.g. XLA reduces bias cotangents
    in bf16 where the kernel keeps f32), and WGAN's real/fake cancellation
    makes some leaves' relative error meaningless. The principled check:
    each path's deviation from the float32 oracle — the kernel must sit
    within the XLA bf16 path's own noise band."""
    cfg16, params, sn, real, fake = _setup("bfloat16")
    cfg32 = ModelConfig(seq_length=L, use_temporal_disc=True, compute_dtype="float32")

    _, oracle_grads, _ = _xla_reference(cfg32, params, sn, real, fake, fused)
    xla_loss, xla_grads, xla_sn = _xla_reference(cfg16, params, sn, real, fake, fused)
    loss, grads, new_sn = critic_temporal_loss_and_grads(
        params, sn, real, fake, _TCONV_SPEC, _POOL_BINS, fused,
        jnp.bfloat16, interpret=True)

    np.testing.assert_allclose(float(loss), float(xla_loss), rtol=5e-2, atol=5e-3)
    leaves = zip(jax.tree.leaves(oracle_grads), jax.tree.leaves(xla_grads),
                 jax.tree.leaves(grads))
    for o, x, k in leaves:
        o = np.asarray(o, np.float32)
        floor = 1e-4 * max(1.0, float(np.abs(o).max()))
        err_xla = np.linalg.norm(np.asarray(x, np.float32) - o) + floor
        err_kernel = np.linalg.norm(np.asarray(k, np.float32) - o)
        assert err_kernel < 2.0 * err_xla, (
            f"grad leaf {o.shape}: kernel deviates {err_kernel:.2e} from the "
            f"f32 oracle vs XLA-bf16's {err_xla:.2e}")
    for ref_leaf, leaf in zip(jax.tree.leaves(xla_sn), jax.tree.leaves(new_sn)):
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref_leaf),
                                   atol=1e-6, rtol=1e-6)


def test_grad_structure_matches_params():
    cfg, params, sn, real, fake = _setup("float32")
    _, grads, new_sn = critic_temporal_loss_and_grads(
        params, sn, real, fake, _TCONV_SPEC, _POOL_BINS, False,
        jnp.float32, interpret=True)
    assert jax.tree.structure(grads) == jax.tree.structure(params)
    assert jax.tree.structure(new_sn) == jax.tree.structure(sn)
    for p, g in zip(jax.tree.leaves(params), jax.tree.leaves(grads)):
        assert p.shape == g.shape


def test_gan_step_wiring_through_kernel(monkeypatch):
    """The _critic_update branch that dispatches to the kernel must produce
    the same post-update critic as the XLA branch (protects the wiring —
    the gate is TPU-only, so plain CPU runs never take it)."""
    import wordgesture_gan_tpu.ops.critic_fused as cf
    import wordgesture_gan_tpu.train.gan_step as gs
    from wordgesture_gan_tpu.train.state import make_optimizer

    cfg, params, sn, real, fake = _setup("float32")
    tx = make_optimizer(1.0)
    opt = tx.init(params)
    disc = {"params": params, "opt": opt, "sn": sn}
    lr = jnp.float32(2e-4)

    ref_disc, ref_loss = gs._critic_update(disc, real, fake, tx, lr, cfg, False)

    # _critic_update imports these from the module at call time, so
    # patching the module attributes redirects the branch.
    monkeypatch.setattr(cf, "fused_critic_available", lambda: True)
    orig = cf.critic_temporal_loss_and_grads
    took_kernel_branch = []

    def spy(*a, **kw):
        took_kernel_branch.append(True)
        return orig(*a, **dict(kw, interpret=True))

    monkeypatch.setattr(cf, "critic_temporal_loss_and_grads", spy)

    k_disc, k_loss = gs._critic_update(disc, real, fake, tx, lr, cfg, False)

    # Guard against the test passing vacuously (e.g. if the call-time
    # import in _critic_update is ever hoisted to module scope).
    assert took_kernel_branch, "_critic_update did not dispatch to the kernel"
    assert float(k_loss) == pytest.approx(float(ref_loss), abs=2e-5)
    for a, b in zip(jax.tree.leaves(ref_disc), jax.tree.leaves(k_disc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_schedules_differ_only_in_sn_state():
    """fused vs reference-schedule: same-magnitude losses, but the fake
    half's σ differs → gradients differ slightly and the u state advances
    once vs twice."""
    cfg, params, sn, real, fake = _setup("float32")
    loss_f, _, sn_f = critic_temporal_loss_and_grads(
        params, sn, real, fake, _TCONV_SPEC, _POOL_BINS, True,
        jnp.float32, interpret=True)
    loss_r, _, sn_r = critic_temporal_loss_and_grads(
        params, sn, real, fake, _TCONV_SPEC, _POOL_BINS, False,
        jnp.float32, interpret=True)
    assert np.isfinite(float(loss_f)) and np.isfinite(float(loss_r))
    # u advanced twice in the reference schedule → states differ
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(sn_f), jax.tree.leaves(sn_r))]
    assert max(diffs) > 0
