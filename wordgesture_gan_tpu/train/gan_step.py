"""The fused two-cycle WGAN train step and the on-device epoch loop.

This is the TPU-native re-design of the reference's per-batch Python loop
(/root/reference/src/shared/utils.py:28-148 + src/gan/trainer.py:84-193):
the n_critic inner loop becomes a ``lax.fori_loop``, all four optimizer
updates happen inside one jitted function, and — when ``scan_epoch`` — the
whole epoch is a single ``lax.scan`` over pre-permuted device-resident
batches, so one XLA program per epoch with zero host round-trips.

Gradient-flow semantics preserved exactly:
  * critics train on stop_gradient'd fakes (reference utils.py:70-109);
  * cycle-1 latent recovery runs the encoder under stop_gradient — no
    gradient flows to E *or back into G* through z' (reference
    trainer.py:116-119 wraps the encoder call in torch.no_grad);
  * cycle-2 critic scores/features backprop into G and E but D2 parameters
    are not updated by the joint step;
  * real-side critic features are detached in the feature-matching loss;
  * per-model global-norm clipping before each Adam update.

Spectral-norm power iteration advances once per critic forward, threaded
functionally (torch mutates buffers on every training forward) and batched
across layers (layers.batched_spectral_normalize). The default critic
update reproduces the reference's two sequential forwards bit-exactly;
``TrainingConfig.fused_critic_forward`` scores (real ++ fake) in ONE
forward instead (one u advance; perf- and quality-neutral, see the config
docstring).
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
    diversity_hinge_loss,
    mode_seeking_loss,
    reconstruction_loss,
    speed_profile_loss,
    time_delta_corr_loss,
    time_delta_loss,
    wgan_critic_loss,
    wgan_generator_loss,
)
from ..models.gan import disc_apply, encoder_apply, generator_apply
from .state import apply_update, make_optimizer


def _critic_update(disc, real, fake, tx, lr, model_config, fused: bool = False):
    """One critic step: WGAN loss on (real, stop_grad(fake)), clip, Adam.

    ``disc`` is the {'params','opt','sn'} subtree; returns (new_disc, loss).
    ``fused`` scores the concatenated (real ++ fake) batch with one
    spectral-norm advance; the default reproduces the reference's two
    sequential forwards exactly (TrainingConfig docstring).

    XLA autodiff is the production path. A fused Pallas kernel emitting
    the temporal critic's weight gradients directly (possible because the
    update needs no input gradients and the WGAN cotangent is constant)
    was built, validated, measured SLOWER than this path at B=512 on v5e,
    and retired — see ARCHITECTURE.md "Negative result: fused Pallas
    critic-update kernel" (kernel at git 11040c7:ops/critic_fused.py).
    """
    fake = jax.lax.stop_gradient(fake)
    nb = real.shape[0]

    def loss_fn(params, sn):
        if fused:
            scores, _, sn = disc_apply(
                params, sn, jnp.concatenate([real, fake]), True, model_config)
            real_scores, fake_scores = scores[:nb], scores[nb:]
        else:
            real_scores, _, sn = disc_apply(params, sn, real, True, model_config)
            fake_scores, _, sn = disc_apply(params, sn, fake, True, model_config)
        return wgan_critic_loss(real_scores, fake_scores), sn

    (loss, new_sn), grads = jax.value_and_grad(loss_fn, has_aux=True)(disc["params"], disc["sn"])
    new_params, new_opt = apply_update(disc["params"], grads, disc["opt"], tx, lr)
    return {"params": new_params, "opt": new_opt, "sn": new_sn}, loss


def gan_train_step(
    state: Dict,
    batch: Dict[str, jnp.ndarray],
    lr: jnp.ndarray,
    model_config: ModelConfig,
    training_config: TrainingConfig,
    noise: Dict[str, jnp.ndarray] = None,
) -> Tuple[Dict, Dict[str, jnp.ndarray]]:
    """One fused two-cycle step on one batch. Pure; jit/scan-safe.

    ``noise`` (optional, parity-harness only) pre-draws every stochastic
    input instead of consuming the state RNG: ``z_rand``/``eps_enc``
    (n_critic, B, Z) for the critic loop, ``z1``/``eps_rec``/``eps2``
    (B, Z) for the joint step — the draw order the reference trainer uses
    (utils.py:68-120), so both stacks can be fed identical randomness."""
    real = batch["gesture"]
    proto = batch["prototype"]
    B = real.shape[0]
    Z = model_config.latent_dim
    tx = make_optimizer(training_config.grad_clip_norm)

    rng = state["rng"]
    g_params = state["g"]["params"]
    e_params = state["e"]["params"]

    # ----- critic inner loop (reference utils.py:68-109) -----
    # G and E are FROZEN during the loop (only the critics update), so every
    # latent draw is hoisted: the per-iteration key splits are pre-unrolled
    # (identical RNG stream to splitting inside the loop) and the encoder
    # runs ONCE — it has no stochastic layers, so mu/log_var are
    # iteration-invariant (the reference recomputes the same forward under
    # no_grad each iteration, utils.py:90-109) with a fresh
    # reparameterization eps per iteration. The generator forwards stay
    # in-loop: they are throughput-bound on this hardware (lane-tiling all
    # 2×n_critic draws into one fused launch measured 5.6 ms vs 5.3 ms for
    # sequential launches — no amortization to win), but each one runs the
    # fused Pallas BiLSTM kernel via inference=True.
    n_c = training_config.n_critic
    zkeys, ekeys = [], []
    for _ in range(n_c):
        rng, kz, ke = jax.random.split(rng, 3)
        zkeys.append(kz)
        ekeys.append(ke)
    if n_c > 0:
        if noise is not None:
            z_rands = noise["z_rand"]
            eps_encs = noise["eps_enc"]
        else:
            z_rands = jnp.stack([jax.random.normal(k, (B, Z)) for k in zkeys])
            eps_encs = None
        _, mu_c, log_var_c = encoder_apply(e_params, real, ekeys[0], model_config)
        sigma_c = jnp.exp(0.5 * log_var_c)
        if eps_encs is not None:
            z_encs = mu_c[None] + eps_encs * sigma_c[None]
        else:
            z_encs = jnp.stack(
                [mu_c + jax.random.normal(k, mu_c.shape) * sigma_c for k in ekeys]
            )

        proto2 = jnp.concatenate([proto, proto])

        def critic_iter(i, carry):
            d1, d2, _, _ = carry
            z1 = jax.lax.dynamic_index_in_dim(z_rands, i, keepdims=False)
            z2 = jax.lax.dynamic_index_in_dim(z_encs, i, keepdims=False)
            # D1 trains against G(proto, z_rand); D2 against G(proto, E(real).z).
            # Same generator weights for both draws, and the fused BiLSTM
            # kernel is latency-bound, not compute-bound — one 2B-batch
            # forward costs ~1.07x a B-batch forward (measured on v5e:
            # 2.16 ms at B=512 vs 2.31 ms at B=1024), so batching the pair
            # halves the dominant cost of the critic loop (~2.3 ms/step).
            fakes = generator_apply(
                g_params, proto2, jnp.concatenate([z1, z2]), model_config,
                inference=True,
            )
            fake1, fake2 = fakes[:B], fakes[B:]
            fused = training_config.fused_critic_forward
            d1, d1_loss = _critic_update(d1, real, fake1, tx, lr, model_config, fused)
            d2, d2_loss = _critic_update(d2, real, fake2, tx, lr, model_config, fused)
            return (d1, d2, d1_loss, d2_loss)

        carry0 = (state["d1"], state["d2"], jnp.float32(0), jnp.float32(0))
        d1, d2, d1_loss, d2_loss = jax.lax.fori_loop(0, n_c, critic_iter, carry0,
                                                     unroll=True)
    else:
        # n_critic=0 ablation: critics untouched (matches the reference's
        # skipped range(n_critic) loop).
        d1, d2 = state["d1"], state["d2"]
        d1_loss = d2_loss = jnp.float32(0)

    # ----- joint G+E step (reference utils.py:111-135, trainer.py:84-193) -----
    rng, kz1, ke1, ke2 = jax.random.split(rng, 4)
    if training_config.lambda_ms or training_config.lambda_div:
        rng, kz_ms = jax.random.split(rng)
    z1_fixed = noise["z1"] if noise is not None else None
    eps_rec = noise["eps_rec"] if noise is not None else None
    eps2 = noise["eps2"] if noise is not None else None

    def ge_loss_fn(ge_params, d1_sn, d2_sn):
        gp, ep = ge_params

        # Cycle 1: z → X' → z'
        z = z1_fixed if z1_fixed is not None else jax.random.normal(kz1, (B, Z))
        fake1 = generator_apply(gp, proto, z, model_config)
        fake1_scores, fake1_feats, d1_sn = disc_apply(d1["params"], d1_sn, fake1, True, model_config)
        _, real1_feats, d1_sn = disc_apply(d1["params"], d1_sn, real, True, model_config)
        # Latent recovery under no_grad: fully detached (trainer.py:116-119).
        z_rec, _, _ = encoder_apply(ep, jax.lax.stop_gradient(fake1), ke1, model_config,
                                    eps=eps_rec)
        z_rec = jax.lax.stop_gradient(z_rec)

        c1_wgan = wgan_generator_loss(fake1_scores)
        c1_feat = feature_matching_loss(real1_feats, fake1_feats)
        c1_lat = latent_encoding_loss(z, z_rec)
        c1_total = (
            c1_wgan
            + training_config.lambda_feat * c1_feat
            + training_config.lambda_lat * c1_lat
        )
        # Diversity terms on a SECOND prior draw against the cycle-1 fake
        # (static λ's, so the extra generator forward only exists in the
        # program when one of them is enabled). lambda_ms is the MSGAN
        # ratio; lambda_div the bounded hinge at the corpus's measured
        # within-word diversity (losses.diversity_hinge_loss).
        if training_config.lambda_ms or training_config.lambda_div:
            z_ms = jax.random.normal(kz_ms, (B, Z))
            fake_ms = generator_apply(gp, proto, z_ms, model_config)
            if training_config.lambda_ms:
                c1_total = c1_total + training_config.lambda_ms * mode_seeking_loss(
                    fake1, fake_ms, z, z_ms)
            if training_config.lambda_div:
                if training_config.div_margin is None:
                    raise ValueError(
                        "lambda_div requires div_margin; the training loop "
                        "measures it from the data when left as None")
                c1_total = c1_total + training_config.lambda_div * diversity_hinge_loss(
                    fake1, fake_ms, training_config.div_margin)

        # Cycle 2: X → z → X'
        z_enc, mu, log_var = encoder_apply(ep, real, ke2, model_config, eps=eps2)
        fake2 = generator_apply(gp, proto, z_enc, model_config)
        fake2_scores, fake2_feats, d2_sn = disc_apply(d2["params"], d2_sn, fake2, True, model_config)
        _, real2_feats, d2_sn = disc_apply(d2["params"], d2_sn, real, True, model_config)

        c2_wgan = wgan_generator_loss(fake2_scores)
        c2_feat = feature_matching_loss(real2_feats, fake2_feats)
        c2_rec = reconstruction_loss(real, fake2)
        c2_kld = kl_divergence_loss(mu, log_var)
        c2_total = (
            c2_wgan
            + training_config.lambda_feat * c2_feat
            + training_config.lambda_rec * c2_rec
            + training_config.lambda_kld * c2_kld
        )
        # Timing-dynamics auxiliaries (λ's are static floats, so disabled
        # terms are not even traced).
        if training_config.lambda_dt:
            c2_total = c2_total + training_config.lambda_dt * time_delta_loss(real, fake2)
        if training_config.lambda_speed:
            c2_total = c2_total + training_config.lambda_speed * speed_profile_loss(real, fake2)
        if training_config.lambda_dtc:
            c2_total = c2_total + training_config.lambda_dtc * time_delta_corr_loss(real, fake2)

        aux = {
            "cycle1_total": c1_total,
            "cycle1_wgan": c1_wgan,
            "cycle1_feat": c1_feat,
            "cycle1_lat": c1_lat,
            "cycle2_total": c2_total,
            "cycle2_wgan": c2_wgan,
            "cycle2_feat": c2_feat,
            "cycle2_rec": c2_rec,
            "cycle2_kld": c2_kld,
            "d1_sn": d1_sn,
            "d2_sn": d2_sn,
        }
        return c1_total + c2_total, aux

    (_, aux), (g_grads, e_grads) = jax.value_and_grad(ge_loss_fn, has_aux=True)(
        (g_params, e_params), d1["sn"], d2["sn"]
    )

    # Per-model clip + Adam (clipping is per-model as in reference utils.py:132-135).
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


def gan_train_epoch(
    state: Dict,
    epoch_batches: Dict[str, jnp.ndarray],
    lr: jnp.ndarray,
    model_config: ModelConfig,
    training_config: TrainingConfig,
) -> Tuple[Dict, Dict[str, jnp.ndarray]]:
    """Run a whole epoch as one ``lax.scan`` over stacked batches.

    ``epoch_batches`` arrays are shaped (n_batches, B, ...) — already
    shuffled/batched on device. Returns per-batch metric traces.
    """

    def step(carry, batch):
        new_state, metrics = gan_train_step(carry, batch, lr, model_config, training_config)
        return new_state, metrics

    new_state, metric_traces = jax.lax.scan(step, state, epoch_batches)
    new_state = dict(new_state)
    new_state["epoch"] = state["epoch"] + 1
    return new_state, metric_traces


def make_epoch_batches(rng_key, gestures: jnp.ndarray, prototypes: jnp.ndarray,
                       batch_size: int) -> Dict[str, jnp.ndarray]:
    """On-device shuffle + reshape into (n_batches, B, L, 3) stacks
    (drop-last, matching the reference train loader, data.py:526-533)."""
    n = gestures.shape[0]
    n_batches = n // batch_size
    perm = jax.random.permutation(rng_key, n)[: n_batches * batch_size]
    g = jnp.take(gestures, perm, axis=0).reshape(n_batches, batch_size, *gestures.shape[1:])
    p = jnp.take(prototypes, perm, axis=0).reshape(n_batches, batch_size, *prototypes.shape[1:])
    return {"gesture": g, "prototype": p}
