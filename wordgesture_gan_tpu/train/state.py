"""GAN train state: one pytree holding all four models' params, optimizer
states, spectral-norm power-iteration state, and the RNG key.

Replaces the reference's stateful trainer object with 4 torch optimizers
(/root/reference/src/gan/trainer.py:24-82) by a single functional pytree that
a jitted, sharded step maps to its successor.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from ..configs import DEFAULT_MODEL_CONFIG, DEFAULT_TRAINING_CONFIG, ModelConfig, TrainingConfig
from ..models.gan import disc_init, encoder_init, generator_init


def make_optimizer(grad_clip_norm: float) -> optax.GradientTransformation:
    """Per-model transform: global-norm clip → Adam(β=(0.5, 0.999)) statistics.

    The learning rate is applied separately each step (it follows the
    per-epoch cosine schedule), so the transform itself is LR-free:
    ``params -= lr * transform(grads)`` reproduces torch Adam exactly
    (clip-then-Adam ordering matches reference utils.py:87,132-135).
    """
    chain = []
    if grad_clip_norm and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8))
    return optax.chain(*chain)


def apply_update(params, grads, opt_state, tx: optax.GradientTransformation, lr):
    """One optimizer step at learning rate ``lr`` (a traced scalar)."""
    updates, new_opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
    return new_params, new_opt_state


def init_gan_state(
    key,
    model_config: ModelConfig = DEFAULT_MODEL_CONFIG,
    training_config: TrainingConfig = DEFAULT_TRAINING_CONFIG,
) -> Dict:
    """Fresh train state for (G, E, D1, D2). ``key`` may be an int seed
    (preferred) or a PRNG key.

    Initialization runs on the host CPU backend: it is hundreds of tiny
    random ops, which would each cost a dispatch round-trip on an accelerator
    (pathological through a remote-TPU tunnel); the caller device_puts the
    finished pytree onto the mesh in one shot. An int seed keeps even the key
    itself off the accelerator.
    """
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        kg, ke, kd1, kd2, krng = jax.random.split(key, 5)
        tx = make_optimizer(training_config.grad_clip_norm)

        g_params = generator_init(kg, model_config)
        e_params = encoder_init(ke, model_config)
        d1_params, d1_sn = disc_init(kd1, model_config)
        d2_params, d2_sn = disc_init(kd2, model_config)

        return {
            "g": {"params": g_params, "opt": tx.init(g_params)},
            "e": {"params": e_params, "opt": tx.init(e_params)},
            "d1": {"params": d1_params, "opt": tx.init(d1_params), "sn": d1_sn},
            "d2": {"params": d2_params, "opt": tx.init(d2_params), "sn": d2_sn},
            "rng": krng,
            "epoch": jnp.zeros((), jnp.int32),
        }


def param_count(state: Dict) -> Dict[str, int]:
    def count(tree):
        return sum(int(x.size) for x in jax.tree.leaves(tree))

    return {m: count(state[m]["params"]) for m in ("g", "e", "d1", "d2")}
