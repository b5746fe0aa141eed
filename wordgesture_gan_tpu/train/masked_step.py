"""Two-cycle WGAN train step for variable-length traces (BASELINE config 5).

Additive variant of ``gan_step.gan_train_step``: batches carry a per-point
validity mask; the generator is the Transformer family (its attention
consumes the mask), critics and the encoder see padding zeroed out, and the
reconstruction loss averages over valid points only. The parity (fixed-128)
path is untouched.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..configs import ModelConfig, TrainingConfig
from ..losses import (
    feature_matching_loss,
    kl_divergence_loss,
    latent_encoding_loss,
    masked_speed_profile_loss,
    masked_time_delta_corr_loss,
    masked_time_delta_loss,
    wgan_critic_loss,
    wgan_generator_loss,
)
from ..models.gan import disc_apply, encoder_apply
from ..models.generators import transformer_generator_apply
from .state import apply_update, make_optimizer


def masked_reconstruction_loss(real: jnp.ndarray, fake: jnp.ndarray,
                               mask: jnp.ndarray) -> jnp.ndarray:
    """Mean L1 over valid (unpadded) points only. mask: (B, L) in {0,1}."""
    diff = jnp.abs(fake - real) * mask[:, :, None]
    return diff.sum() / jnp.maximum(mask.sum() * real.shape[-1], 1.0)


def _masked(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return x * mask[:, :, None]


def gan_train_step_masked(
    state: Dict,
    batch: Dict[str, jnp.ndarray],   # gesture, prototype, mask (B, L)
    lr: jnp.ndarray,
    model_config: ModelConfig,
    training_config: TrainingConfig,
) -> Tuple[Dict, Dict[str, jnp.ndarray]]:
    """One fused two-cycle step on a masked batch (transformer generator)."""
    assert model_config.generator_type == "transformer", (
        "variable-length training uses the transformer generator "
        "(set ModelConfig.generator_type='transformer')"
    )
    real = batch["gesture"]
    proto = batch["prototype"]
    mask = batch["mask"]
    B = real.shape[0]
    Z = model_config.latent_dim
    tx = make_optimizer(training_config.grad_clip_norm)

    rng = state["rng"]
    g_params = state["g"]["params"]
    e_params = state["e"]["params"]

    real_m = _masked(real, mask)

    def gen(gp, z):
        out = transformer_generator_apply(gp, proto, z, model_config, pad_mask=mask)
        return _masked(out, mask)

    def critic_update(disc, fake):
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(params, sn):
            real_scores, _, sn = disc_apply(params, sn, real_m, True, model_config)
            fake_scores, _, sn = disc_apply(params, sn, fake, True, model_config)
            return wgan_critic_loss(real_scores, fake_scores), sn

        (loss, new_sn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            disc["params"], disc["sn"]
        )
        new_params, new_opt = apply_update(disc["params"], grads, disc["opt"], tx, lr)
        return {"params": new_params, "opt": new_opt, "sn": new_sn}, loss

    # Hoisted latent draws (same structure as gan_step.py's critic loop):
    # G and E are frozen during the loop and E has no stochastic layers, so
    # mu/log_var are iteration-invariant — the encoder runs once, with a
    # fresh reparameterization eps per iteration.
    n_c = training_config.n_critic
    zkeys, ekeys = [], []
    for _ in range(n_c):
        rng, kz, ke = jax.random.split(rng, 3)
        zkeys.append(kz)
        ekeys.append(ke)
    if n_c > 0:
        z_rands = jnp.stack([jax.random.normal(k, (B, Z)) for k in zkeys])
        _, mu_c, log_var_c = encoder_apply(e_params, real_m, ekeys[0], model_config)
        sigma_c = jnp.exp(0.5 * log_var_c)
        z_encs = jnp.stack(
            [mu_c + jax.random.normal(k, mu_c.shape) * sigma_c for k in ekeys]
        )

        def critic_iter(i, carry):
            d1, d2, _, _ = carry
            z1 = jax.lax.dynamic_index_in_dim(z_rands, i, keepdims=False)
            z2 = jax.lax.dynamic_index_in_dim(z_encs, i, keepdims=False)
            d1, d1_loss = critic_update(d1, gen(g_params, z1))
            d2, d2_loss = critic_update(d2, gen(g_params, z2))
            return (d1, d2, d1_loss, d2_loss)

        carry0 = (state["d1"], state["d2"], jnp.float32(0), jnp.float32(0))
        d1, d2, d1_loss, d2_loss = jax.lax.fori_loop(0, n_c, critic_iter, carry0)
    else:
        d1, d2 = state["d1"], state["d2"]
        d1_loss = d2_loss = jnp.float32(0)

    rng, kz1, ke1, ke2 = jax.random.split(rng, 4)

    def ge_loss_fn(ge_params, d1_sn, d2_sn):
        gp, ep = ge_params

        z = jax.random.normal(kz1, (B, Z))
        fake1 = gen(gp, z)
        fake1_scores, fake1_feats, d1_sn = disc_apply(d1["params"], d1_sn, fake1, True, model_config)
        _, real1_feats, d1_sn = disc_apply(d1["params"], d1_sn, real_m, True, model_config)
        z_rec, _, _ = encoder_apply(ep, jax.lax.stop_gradient(fake1), ke1, model_config)
        z_rec = jax.lax.stop_gradient(z_rec)

        c1_total = (
            wgan_generator_loss(fake1_scores)
            + training_config.lambda_feat * feature_matching_loss(real1_feats, fake1_feats)
            + training_config.lambda_lat * latent_encoding_loss(z, z_rec)
        )

        z_enc, mu, log_var = encoder_apply(ep, real_m, ke2, model_config)
        fake2 = gen(gp, z_enc)
        fake2_scores, fake2_feats, d2_sn = disc_apply(d2["params"], d2_sn, fake2, True, model_config)
        _, real2_feats, d2_sn = disc_apply(d2["params"], d2_sn, real_m, True, model_config)

        c2_rec = masked_reconstruction_loss(real, fake2, mask)
        c2_total = (
            wgan_generator_loss(fake2_scores)
            + training_config.lambda_feat * feature_matching_loss(real2_feats, fake2_feats)
            + training_config.lambda_rec * c2_rec
            + training_config.lambda_kld * kl_divergence_loss(mu, log_var)
        )
        # Timing-dynamics auxiliaries, masked twins (losses.masked_*) —
        # same λ knobs as the fixed-length step, restricted to segments
        # with both endpoints valid.
        if training_config.lambda_dt:
            c2_total = c2_total + training_config.lambda_dt * masked_time_delta_loss(
                real, fake2, mask)
        if training_config.lambda_speed:
            c2_total = c2_total + training_config.lambda_speed * masked_speed_profile_loss(
                real, fake2, mask)
        if training_config.lambda_dtc:
            c2_total = c2_total + training_config.lambda_dtc * masked_time_delta_corr_loss(
                real, fake2, mask)

        aux = {
            "cycle1_total": c1_total,
            "cycle2_total": c2_total,
            "cycle2_rec": c2_rec,
            "d1_sn": d1_sn,
            "d2_sn": d2_sn,
        }
        return c1_total + c2_total, aux

    (_, aux), (g_grads, e_grads) = jax.value_and_grad(ge_loss_fn, has_aux=True)(
        (g_params, e_params), d1["sn"], d2["sn"]
    )
    new_g_params, new_g_opt = apply_update(g_params, g_grads, state["g"]["opt"], tx, lr)
    new_e_params, new_e_opt = apply_update(e_params, e_grads, state["e"]["opt"], tx, lr)

    new_state = {
        "g": {"params": new_g_params, "opt": new_g_opt},
        "e": {"params": new_e_params, "opt": new_e_opt},
        "d1": {"params": d1["params"], "opt": d1["opt"], "sn": aux.pop("d1_sn")},
        "d2": {"params": d2["params"], "opt": d2["opt"], "sn": aux.pop("d2_sn")},
        "rng": rng,
        "epoch": state["epoch"],
    }
    metrics = {"d1_loss": d1_loss, "d2_loss": d2_loss, **aux}
    return new_state, metrics


def gan_train_epoch_masked(
    state: Dict,
    epoch_batches: Dict[str, jnp.ndarray],   # gesture/prototype (n, B, L, 3), mask (n, B, L)
    lr: jnp.ndarray,
    model_config: ModelConfig,
    training_config: TrainingConfig,
) -> Tuple[Dict, Dict[str, jnp.ndarray]]:
    """Whole variable-length epoch as one ``lax.scan`` (masked twin of
    gan_step.gan_train_epoch)."""

    def step(carry, batch):
        return gan_train_step_masked(carry, batch, lr, model_config, training_config)

    new_state, metric_traces = jax.lax.scan(step, state, epoch_batches)
    new_state = dict(new_state)
    new_state["epoch"] = state["epoch"] + 1
    return new_state, metric_traces


def make_epoch_batches_masked(rng_key, gestures: jnp.ndarray, prototypes: jnp.ndarray,
                              masks: jnp.ndarray, batch_size: int) -> Dict[str, jnp.ndarray]:
    """On-device shuffle + reshape into stacked masked batches (drop-last)."""
    n = gestures.shape[0]
    n_batches = n // batch_size
    perm = jax.random.permutation(rng_key, n)[: n_batches * batch_size]

    def take(x):
        return jnp.take(x, perm, axis=0).reshape(n_batches, batch_size, *x.shape[1:])

    return {"gesture": take(gestures), "prototype": take(prototypes), "mask": take(masks)}
