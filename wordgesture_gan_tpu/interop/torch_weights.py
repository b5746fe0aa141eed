"""Convert reference torch ``state_dict``s into this framework's pytrees.

The reference checkpoints (/root/reference/src/gan/trainer.py:195-230) store
four torch models; these converters map each onto our functional param
layout so users can migrate trained reference checkpoints, and so the parity
harness can run both stacks from literally identical weights.

Input is a plain ``{name: np.ndarray}`` mapping (call
``{k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}`` on
the torch side) — this module never imports torch.

Layout notes:
  * torch ``nn.Linear`` stores ``weight`` as (out, in); ours is (in, out) →
    transpose.
  * torch ``nn.LSTM`` gate order (i, f, g, o) matches ours; ``weight_ih_l{k}``
    is (4H, in) → transpose. Layer-0 input rows are ordered [proto | z] in
    both stacks (reference models.py:154-157 concatenates in that order).
  * torch ``nn.Conv1d`` stores (out, in, k); ours is WIO (k, in, out).
  * ``spectral_norm`` stores the unnormalized weight as ``weight_orig`` plus
    power-iteration buffers ``weight_u`` (out,) / ``weight_v``; our params
    hold the unnormalized weight and the sn state holds u — v is recomputed
    from u each step exactly as torch does (models/layers.py:84-103).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from ..configs import ModelConfig


Array = np.ndarray
StateDict = Mapping[str, Array]


def _lin(sd: StateDict, prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "w": jnp.asarray(sd[f"{prefix}.weight"].T, jnp.float32),
        "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
    }


def _sn_lin(sd: StateDict, prefix: str) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    params = {
        "w": jnp.asarray(sd[f"{prefix}.weight_orig"].T, jnp.float32),
        "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
    }
    return params, jnp.asarray(sd[f"{prefix}.weight_u"], jnp.float32)


def _sn_conv(sd: StateDict, prefix: str) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    w = sd[f"{prefix}.weight_orig"]            # (out, in, k)
    params = {
        "w": jnp.asarray(np.transpose(w, (2, 1, 0)), jnp.float32),  # WIO
        "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
    }
    return params, jnp.asarray(sd[f"{prefix}.weight_u"], jnp.float32)


def encoder_from_torch(sd: StateDict, config: ModelConfig) -> Dict:
    """VariationalEncoder (reference models.py:18-86) → encoder pytree."""
    n_hidden = len(config.enc_hidden_dims)
    # Sequential interleaves LeakyReLU: Linear modules sit at indices 0,2,4,…
    mlp = [_lin(sd, f"encoder.{2 * i}") for i in range(n_hidden)]
    return {"mlp": mlp, "mu": _lin(sd, "fc_mu"), "log_var": _lin(sd, "fc_log_var")}


def generator_from_torch(sd: StateDict, config: ModelConfig) -> Dict:
    """BiLSTM Generator (reference models.py:89-165) → generator pytree."""
    layers = []
    for k in range(config.gen_num_layers):
        layer = {}
        for our_dir, suffix in (("fwd", ""), ("bwd", "_reverse")):
            layer[our_dir] = {
                "w_ih": jnp.asarray(sd[f"lstm.weight_ih_l{k}{suffix}"].T, jnp.float32),
                "w_hh": jnp.asarray(sd[f"lstm.weight_hh_l{k}{suffix}"].T, jnp.float32),
                "b_ih": jnp.asarray(sd[f"lstm.bias_ih_l{k}{suffix}"], jnp.float32),
                "b_hh": jnp.asarray(sd[f"lstm.bias_hh_l{k}{suffix}"], jnp.float32),
            }
        layers.append(layer)
    return {"lstm": layers, "out": _lin(sd, "output_layer")}


def mlp_disc_from_torch(sd: StateDict, config: ModelConfig) -> Tuple[Dict, Dict]:
    """MLP Discriminator (reference models.py:168-243) → (params, sn_state)."""
    layers, us = [], []
    for i in range(len(config.disc_hidden_dims)):
        p, u = _sn_lin(sd, f"layers.{i}")
        layers.append(p)
        us.append(u)
    out_p, out_u = _sn_lin(sd, "output_layer")
    return {"layers": layers, "out": out_p}, {"layers": us, "out": out_u}


def temporal_disc_from_torch(sd: StateDict, config: ModelConfig) -> Tuple[Dict, Dict]:
    """TemporalDiscriminator (reference models.py:246-353) → (params, sn_state).

    Spectral-norm u vectors transfer unchanged: torch power-iterates the
    (out, in·k) view, we the (k·in, out) view — a row permutation of the same
    matrix, which leaves u (and sigma) identical (models/layers.py:150-174).
    """
    convs, conv_us = [], []
    for seq_idx in (0, 2, 4):                  # LeakyReLUs at odd indices
        p, u = _sn_conv(sd, f"temporal_conv.{seq_idx}")
        convs.append(p)
        conv_us.append(u)
    mlps, mlp_us = [], []
    for seq_idx in (0, 2):
        p, u = _sn_lin(sd, f"mlp.{seq_idx}")
        mlps.append(p)
        mlp_us.append(u)
    out_p, out_u = _sn_lin(sd, "output_layer")
    return (
        {"convs": convs, "mlp": mlps, "out": out_p},
        {"convs": conv_us, "mlp": mlp_us, "out": out_u},
    )


def disc_from_torch(sd: StateDict, config: ModelConfig) -> Tuple[Dict, Dict]:
    if config.use_temporal_disc:
        return temporal_disc_from_torch(sd, config)
    return mlp_disc_from_torch(sd, config)


def autoencoder_from_torch(sd: StateDict, config: ModelConfig) -> Dict:
    """FID AutoEncoder (reference models.py:356-450) → autoencoder pytree."""
    return {
        "enc": [_lin(sd, f"timestep_encoder.{i}") for i in (0, 2, 4, 6)],
        "post_pool": _lin(sd, "post_pool"),
        "pre_expand": _lin(sd, "pre_expand"),
        "dec": [_lin(sd, f"timestep_decoder.{i}") for i in (0, 2, 4, 6)],
    }


def contrastive_encoder_from_torch(sd: StateDict) -> Tuple[Dict, Dict]:
    """ContrastiveEncoder (reference contrastive/model.py:48-121) →
    (params, batchnorm_state). torch layout: ``conv_layers`` Sequential
    with Conv1d at 0/3/6 and BatchNorm1d at 1/4/7; ``projection`` Linear
    at 0/2."""
    convs, bns, bn_states = [], [], []
    for conv_i, bn_i in ((0, 1), (3, 4), (6, 7)):
        w = sd[f"conv_layers.{conv_i}.weight"]            # (out, in, k)
        convs.append({
            "w": jnp.asarray(np.transpose(w, (2, 1, 0)), jnp.float32),  # WIO
            "b": jnp.asarray(sd[f"conv_layers.{conv_i}.bias"], jnp.float32),
        })
        bns.append({
            "scale": jnp.asarray(sd[f"conv_layers.{bn_i}.weight"], jnp.float32),
            "bias": jnp.asarray(sd[f"conv_layers.{bn_i}.bias"], jnp.float32),
        })
        bn_states.append({
            "mean": jnp.asarray(sd[f"conv_layers.{bn_i}.running_mean"], jnp.float32),
            "var": jnp.asarray(sd[f"conv_layers.{bn_i}.running_var"], jnp.float32),
        })
    params = {
        "convs": convs,
        "bns": bns,
        "proj": [_lin(sd, "projection.0"), _lin(sd, "projection.2")],
    }
    return params, {"bns": bn_states}


def trainer_state_from_torch(
    checkpoint: Mapping[str, StateDict],
    model_config: ModelConfig,
    training_config,
    rng_key,
) -> Dict:
    """Reference trainer checkpoint dict (trainer.py:195-212: keys
    'generator'/'encoder'/'discriminator_1'/'discriminator_2') → a fresh
    train-state pytree with those weights and zero optimizer statistics
    (optimizer state is not convertible: torch Adam steps count from the
    checkpoint's step, ours from 0 — resume at your own epoch numbering)."""
    import jax

    from ..train.state import make_optimizer

    tx = make_optimizer(training_config.grad_clip_norm)
    g = generator_from_torch(checkpoint["generator"], model_config)
    e = encoder_from_torch(checkpoint["encoder"], model_config)
    d1_p, d1_u = disc_from_torch(checkpoint["discriminator_1"], model_config)
    d2_p, d2_u = disc_from_torch(checkpoint["discriminator_2"], model_config)
    return {
        "g": {"params": g, "opt": tx.init(g)},
        "e": {"params": e, "opt": tx.init(e)},
        "d1": {"params": d1_p, "opt": tx.init(d1_p), "sn": d1_u},
        "d2": {"params": d2_p, "opt": tx.init(d2_p), "sn": d2_u},
        "rng": rng_key if not isinstance(rng_key, int) else jax.random.PRNGKey(rng_key),
        "epoch": jnp.zeros((), jnp.int32),
    }
