"""WordGesture-GAN model family: variational encoder, BiLSTM generator,
MLP + temporal (Conv1D) critics, and the FID feature autoencoder.

Functional re-design of the reference architectures
(/root/reference/src/gan/models.py) — identical layer topology and
activation flow, expressed as init/apply pairs over explicit pytrees.
Discriminators return their hidden-layer feature taps (for the Pix2PixHD
feature-matching loss) and the updated spectral-norm state.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..configs import DEFAULT_MODEL_CONFIG, ModelConfig
from .layers import (
    batched_spectral_normalize,
    bilstm_apply,
    bilstm_init,
    cast_floats,
    dense,
    dense_init,
    leaky_relu,
    sn_conv1d_init,
    sn_dense_init,
)


def _cast_wb(w, b, dtype):
    """Mixed-precision cast for a normalized weight + bias pair."""
    if w.dtype != jnp.dtype(dtype):
        return w.astype(dtype), b.astype(dtype)
    return w, b


def _compute_dtype(config) -> jnp.dtype:
    """The mixed-precision compute dtype (ModelConfig.compute_dtype); params
    and losses stay float32 — see layers.cast_floats for the contract."""
    return jnp.dtype(getattr(config, "compute_dtype", "float32") if config is not None else "float32")


def apply_time_head(raw: jnp.ndarray, mode: str,
                    pad_mask: jnp.ndarray = None) -> jnp.ndarray:
    """Output-head activation for a generator's raw (B, L, 3) pre-activations.

    ``mode="tanh"`` is the reference head (models.py:123,163): tanh on all
    three channels. ``mode="monotone"`` keeps tanh on (x, y) but builds the
    time channel as the cumsum of softmax'd increment logits — t[0] = 0,
    t[L-1] = 1, strictly increasing — so the generator models the *clock
    warp* (where time dilates: corners, pauses) rather than 128 nearly-equal
    absolute timestamps whose finite differences are numerically hostile
    (see ModelConfig.time_head). Shapes and parameter layout are identical
    in both modes; only this activation differs.

    ``pad_mask`` (B, L), 1 = valid: variable-length traces confine the
    softmax mass to valid increments (increment i, between positions i and
    i+1, is valid iff position i+1 is), so the clock spans 0→1 over the
    VALID segment and stays flat at 1 through padding. With an all-ones
    mask this is identical to the unmasked head; for fully-invalid rows
    (eval chunk padding) the max-subtracted softmax degrades to a uniform
    ramp, which consumers mask out anyway."""
    if mode == "tanh":
        return jnp.tanh(raw)
    if mode != "monotone":
        raise ValueError(f"unknown time_head mode: {mode!r}")
    xy = jnp.tanh(raw[..., :2])
    # L-1 increment logits (the position-0 logit is unused so the parameter
    # layout matches the tanh head exactly). Softmax in fp32: 127-way
    # normalization of bf16 exponentials loses the very resolution the
    # monotone head exists to provide.
    logits = raw[..., 1:, 2].astype(jnp.float32)
    if pad_mask is not None:
        logits = jnp.where(pad_mask[..., 1:] > 0, logits, -1e30)
    inc = jax.nn.softmax(logits, axis=-1)
    t = jnp.cumsum(inc, axis=-1)
    t = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    return jnp.concatenate([xy, t[..., None].astype(xy.dtype)], axis=-1)

# ---------------------------------------------------------------------------
# Variational encoder (reference models.py:18-86)
# ---------------------------------------------------------------------------


def encoder_init(key, config: ModelConfig = DEFAULT_MODEL_CONFIG) -> Dict:
    dims = (config.seq_length * config.input_dim,) + tuple(config.enc_hidden_dims)
    keys = jax.random.split(key, len(dims) + 1)
    return {
        "mlp": [dense_init(keys[i], dims[i], dims[i + 1]) for i in range(len(dims) - 1)],
        "mu": dense_init(keys[-2], dims[-1], config.latent_dim),
        "log_var": dense_init(keys[-1], dims[-1], config.latent_dim),
    }


def encoder_apply(params, x: jnp.ndarray, rng,
                  config: ModelConfig = None, *,
                  eps: jnp.ndarray = None) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gesture (B, L, 3) → (z, mu, log_var) via the reparameterization trick.

    ``rng`` drives the epsilon draw (torch uses randn_like,
    reference models.py:78-86); a pre-drawn ``eps`` overrides it (used by the
    cross-implementation parity harness to feed both stacks identical noise).
    Under mixed precision the hidden MLP runs in bf16; the (mu, log_var)
    heads and the reparameterization stay float32 so the KL term and z are
    full precision."""
    dtype = _compute_dtype(config)
    h = x.reshape(x.shape[0], -1)
    mlp = params["mlp"]
    if dtype != jnp.float32:
        h = h.astype(dtype)
        mlp = cast_floats(mlp, dtype)
    for layer in mlp:
        h = leaky_relu(dense(layer, h))
    h = h.astype(jnp.float32)
    mu = dense(params["mu"], h)
    log_var = dense(params["log_var"], h)
    if eps is None:
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
    z = mu + eps * jnp.exp(0.5 * log_var)
    return z, mu, log_var


# ---------------------------------------------------------------------------
# Generator: stacked BiLSTM + tanh head (reference models.py:89-165)
# ---------------------------------------------------------------------------


def generator_init(key, config: ModelConfig = DEFAULT_MODEL_CONFIG) -> Dict:
    """Generator factory dispatching on ``config.generator_type``:
    "bilstm" (reference parity), "mlp", or "transformer"
    (see models/generators.py for the variants)."""
    if config.generator_type == "mlp":
        from .generators import mlp_generator_init

        return mlp_generator_init(key, config)
    if config.generator_type == "transformer":
        from .generators import transformer_generator_init

        return transformer_generator_init(key, config)

    proto_dim = config.input_dim if config.prototype_has_time else 2
    in_dim = proto_dim + config.latent_dim
    k_lstm, k_out = jax.random.split(key)
    return {
        "lstm": bilstm_init(k_lstm, in_dim, config.gen_hidden_dim, config.gen_num_layers),
        "out": dense_init(k_out, 2 * config.gen_hidden_dim, config.input_dim),
    }


def generator_apply(
    params, prototype: jnp.ndarray, z: jnp.ndarray,
    config: ModelConfig = DEFAULT_MODEL_CONFIG,
    *, inference: bool = False,
) -> jnp.ndarray:
    """(prototype (B, L, 3), z (B, Z)) → gesture (B, L, 3).

    The latent code is broadcast along the sequence and concatenated with the
    (x, y)-only prototype (time channel withheld when prototype_has_time is
    False — the generator must learn timing from curvature,
    reference models.py:147-157).

    ``inference=True`` marks a forward that is never differentiated (the
    critic loop's fakes — stop_gradient'd, 10 of the 12 generator
    applications per train step — and eval-time sampling). On a single TPU
    device the BiLSTM stack then runs as one fused Pallas program
    (ops/bilstm_fused.py: 0.52 ms vs 0.79 ms XLA scan at B=512 on v5e);
    everywhere else the flag is a no-op."""
    if config.generator_type == "mlp":
        from .generators import mlp_generator_apply

        return mlp_generator_apply(params, prototype, z, config)
    if config.generator_type == "transformer":
        from .generators import transformer_generator_apply

        return transformer_generator_apply(params, prototype, z, config)

    proto = prototype if config.prototype_has_time else prototype[:, :, :2]
    dtype = _compute_dtype(config)

    if proto.shape[-1] == 2:
        from ..ops.bilstm_fused import fused_single_device

        if fused_single_device():
            if inference:
                from ..ops.bilstm_fused import fused_bilstm_fwd

                h = fused_bilstm_fwd(params["lstm"], proto, config.gen_hidden_dim,
                                     z, dtype=dtype)
            else:
                # Differentiated path: fused Pallas forward+backward-through-
                # time (ops/bilstm_train.py) — the custom_vjp replaces the
                # XLA scan VJP (2.4 ms vs 3.2 ms fwd+bwd at B=512 bf16 on v5e).
                from ..ops.bilstm_train import bilstm_train_apply

                h = bilstm_train_apply(params["lstm"], proto, z,
                                       config.gen_hidden_dim, dtype=dtype)
            return apply_time_head(dense(params["out"], h.astype(jnp.float32)),
                                   config.time_head)

    lstm = params["lstm"]
    zc = z
    if dtype != jnp.float32:
        # bf16 recurrence: halves the HBM traffic of the scan's carried state
        # and gate activations; the fp32 output head + tanh restore a
        # full-precision gesture for the losses/critics.
        proto = proto.astype(dtype)
        zc = zc.astype(dtype)
        lstm = cast_floats(lstm, dtype)
    # z is time-constant: instead of broadcasting it along L into the scanned
    # stream (reference models.py:154-157), it enters layer 1 as a static
    # input projected once — w_ih rows stay ordered [proto | z].
    h = bilstm_apply(lstm, proto, config.gen_hidden_dim, static=zc)
    h = h.astype(jnp.float32)
    return apply_time_head(dense(params["out"], h), config.time_head)


# ---------------------------------------------------------------------------
# MLP critic with spectral norm (reference models.py:168-243)
# ---------------------------------------------------------------------------


def mlp_disc_init(key, config: ModelConfig = DEFAULT_MODEL_CONFIG) -> Tuple[Dict, Dict]:
    """Returns (params, spectral_state)."""
    dims = (config.seq_length * config.input_dim,) + tuple(config.disc_hidden_dims)
    keys = jax.random.split(key, len(dims))
    layers, us = [], []
    for i in range(len(dims) - 1):
        p, u = sn_dense_init(keys[i], dims[i], dims[i + 1])
        layers.append(p)
        us.append(u)
    out_p, out_u = sn_dense_init(keys[-1], dims[-1], 1)
    return {"layers": layers, "out": out_p}, {"layers": us, "out": out_u}


def mlp_disc_apply(params, state, x: jnp.ndarray, update_stats: bool, dtype=jnp.float32):
    """(B, L, 3) → (scores (B, 1), features list, new spectral state).

    Features are the post-LeakyReLU activations of every hidden layer
    (reference models.py:225-243); the output head is unbounded (WGAN).
    Under mixed precision the matmuls run in ``dtype``; scores are returned
    float32 (the WGAN loss is a difference of means — keep it exact).
    All layers' spectral-norm power iterations run as ONE batched
    computation up front (layers.batched_spectral_normalize)."""
    layer_ps = list(params["layers"]) + [params["out"]]
    ws_sn, new_us = batched_spectral_normalize(
        [p["w"] for p in layer_ps],
        list(state["layers"]) + [state["out"]],
        update_stats,
    )
    h = x.reshape(x.shape[0], -1).astype(dtype)
    features = []
    for p, w_sn in zip(layer_ps[:-1], ws_sn[:-1]):
        w, b = _cast_wb(w_sn, p["b"], dtype)
        h = leaky_relu(h @ w + b)
        features.append(h)
    w, b = _cast_wb(ws_sn[-1], layer_ps[-1]["b"], dtype)
    out = h @ w + b
    return out.astype(jnp.float32), features, {"layers": new_us[:-1], "out": new_us[-1]}


# ---------------------------------------------------------------------------
# Temporal critic: spectral-norm Conv1D stack (reference models.py:246-353)
# ---------------------------------------------------------------------------

_TCONV_SPEC = ((3, 64, 5, 2), (64, 64, 5, 2), (64, 32, 3, 1))  # in, out, k, pad
_POOL_BINS = 8


def temporal_disc_init(key, config: ModelConfig = DEFAULT_MODEL_CONFIG) -> Tuple[Dict, Dict]:
    keys = jax.random.split(key, 6)
    convs, conv_us = [], []
    for i, (cin, cout, k, _pad) in enumerate(_TCONV_SPEC):
        p, u = sn_conv1d_init(keys[i], cin, cout, k)
        convs.append(p)
        conv_us.append(u)
    m1, u1 = sn_dense_init(keys[3], _TCONV_SPEC[-1][1] * _POOL_BINS, 128)
    m2, u2 = sn_dense_init(keys[4], 128, 64)
    out, uo = sn_dense_init(keys[5], 64, 1)
    return (
        {"convs": convs, "mlp": [m1, m2], "out": out},
        {"convs": conv_us, "mlp": [u1, u2], "out": uo},
    )


def _adaptive_avg_pool(h: jnp.ndarray, bins: int) -> jnp.ndarray:
    """(B, L, C) → (B, bins, C) by averaging equal chunks (torch
    AdaptiveAvgPool1d semantics for L divisible by bins)."""
    B, L, C = h.shape
    return h.reshape(B, bins, L // bins, C).mean(axis=2)


def temporal_disc_apply(params, state, x: jnp.ndarray, update_stats: bool, dtype=jnp.float32):
    """(B, L, 3) → (scores, features, new spectral state). Works in NWC layout
    (the reference permutes to NCW for torch Conv1d; XLA prefers
    channel-last on TPU). Feature taps: the 3 conv activations flattened +
    2 MLP activations (reference models.py:319-353). ``dtype`` is the
    mixed-precision compute dtype; scores come back float32. All six
    layers' spectral-norm power iterations (convs viewed as
    (kernel·in_ch, out_ch) matrices, torch-style) run as ONE batched
    computation up front (layers.batched_spectral_normalize)."""
    B = x.shape[0]
    conv_ps, mlp_ps = params["convs"], params["mlp"]
    n_conv = len(conv_ps)
    ws_sn, new_us = batched_spectral_normalize(
        [p["w"].reshape(-1, p["w"].shape[-1]) for p in conv_ps]
        + [p["w"] for p in mlp_ps] + [params["out"]["w"]],
        list(state["convs"]) + list(state["mlp"]) + [state["out"]],
        update_stats,
    )

    h = x.astype(dtype)
    features = []
    for p, w_sn, (_cin, _cout, _k, pad) in zip(conv_ps, ws_sn[:n_conv], _TCONV_SPEC):
        w, b = _cast_wb(w_sn.reshape(p["w"].shape), p["b"], dtype)
        h = jax.lax.conv_general_dilated(
            h, w,
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + b
        h = leaky_relu(h)
        features.append(h.reshape(B, -1))

    pooled = _adaptive_avg_pool(h, _POOL_BINS)           # (B, 8, 32)
    # torch flattens (B, C, bins) row-major = channel-major ordering.
    flat = jnp.swapaxes(pooled, 1, 2).reshape(B, -1)     # (B, 256)

    h2 = flat
    for p, w_sn in zip(mlp_ps, ws_sn[n_conv:-1]):
        w, b = _cast_wb(w_sn, p["b"], dtype)
        h2 = leaky_relu(h2 @ w + b)
        features.append(h2)
    w, b = _cast_wb(ws_sn[-1], params["out"]["b"], dtype)
    out = h2 @ w + b
    return out.astype(jnp.float32), features, {
        "convs": new_us[:n_conv],
        "mlp": new_us[n_conv:-1],
        "out": new_us[-1],
    }


def disc_init(key, config: ModelConfig = DEFAULT_MODEL_CONFIG):
    """Critic factory honoring ``use_temporal_disc`` (reference trainer.py:49-51)."""
    if config.use_temporal_disc:
        return temporal_disc_init(key, config)
    return mlp_disc_init(key, config)


def disc_apply(params, state, x, update_stats: bool, config: ModelConfig = DEFAULT_MODEL_CONFIG):
    dtype = _compute_dtype(config)
    if config.use_temporal_disc:
        return temporal_disc_apply(params, state, x, update_stats, dtype=dtype)
    return mlp_disc_apply(params, state, x, update_stats, dtype=dtype)


# ---------------------------------------------------------------------------
# FID feature autoencoder (reference models.py:356-450)
# ---------------------------------------------------------------------------

_AE_DIMS = (192, 96, 48)


def autoencoder_init(key, config: ModelConfig = DEFAULT_MODEL_CONFIG, hidden_dim: int = 32,
                     positional: bool = False) -> Dict:
    """FID feature autoencoder.

    ``positional=False`` is the paper/reference architecture
    (models.py:356-450) — note its decoder broadcasts the latent identically
    to every timestep with NO positional signal, so it can only emit a
    constant trace: reconstruction L1 is floor-bounded by the per-gesture
    mean absolute deviation (~0.25 on synthetic data), and the encoder is
    only ever trained to encode the gesture's central point, which makes
    FID near-blind to shape/timing differences.

    ``positional=True`` concatenates a normalized time ramp to the decoder's
    per-timestep input, so the decoder can emit time-varying traces and the
    encoder must embed actual gesture shape — same encoder (and therefore
    the same 32-d FID feature space dimensionality), strictly more
    informative features. The mode is recoverable from the params (first
    decoder layer's fan-in)."""
    enc_dims = (config.input_dim,) + _AE_DIMS + (hidden_dim,)
    dec_in = hidden_dim + (1 if positional else 0)
    dec_dims = (dec_in,) + _AE_DIMS[::-1] + (config.input_dim,)
    keys = jax.random.split(key, len(enc_dims) + len(dec_dims))
    ki = iter(keys)
    return {
        "enc": [dense_init(next(ki), enc_dims[i], enc_dims[i + 1]) for i in range(len(enc_dims) - 1)],
        "post_pool": dense_init(next(ki), hidden_dim, hidden_dim),
        "pre_expand": dense_init(next(ki), hidden_dim, hidden_dim),
        "dec": [dense_init(next(ki), dec_dims[i], dec_dims[i + 1]) for i in range(len(dec_dims) - 1)],
    }


def autoencoder_encode(params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, 3) → (B, hidden): per-timestep MLP, mean-pool over the
    sequence, then a linear head (reference models.py:405-424)."""
    h = x
    for i, layer in enumerate(params["enc"]):
        h = dense(layer, h)
        if i < len(params["enc"]) - 1:
            h = leaky_relu(h)
    pooled = h.mean(axis=1)
    return dense(params["post_pool"], pooled)


def autoencoder_decode(params, z: jnp.ndarray, seq_length: int) -> jnp.ndarray:
    h = dense(params["pre_expand"], z)
    h = jnp.broadcast_to(h[:, None, :], (h.shape[0], seq_length, h.shape[1]))
    if params["dec"][0]["w"].shape[0] == h.shape[-1] + 1:
        # Positional mode (see autoencoder_init): a [-1, 1] time ramp joins
        # the broadcast latent so each timestep decodes differently.
        ramp = jnp.linspace(-1.0, 1.0, seq_length, dtype=h.dtype)
        ramp = jnp.broadcast_to(ramp[None, :, None], (h.shape[0], seq_length, 1))
        h = jnp.concatenate([h, ramp], axis=-1)
    for i, layer in enumerate(params["dec"]):
        h = dense(layer, h)
        if i < len(params["dec"]) - 1:
            h = leaky_relu(h)
    return jnp.tanh(h)


def autoencoder_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    return autoencoder_decode(params, autoencoder_encode(params, x), x.shape[1])
