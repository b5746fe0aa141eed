"""Functional building blocks: dense / conv1d / LSTM / spectral norm / batchnorm.

Design: every layer is a pure ``init(key, ...) -> params`` plus an
``apply(params, x, ...)`` function over explicit pytrees — no module
framework. This keeps the two-cycle GAN step (which applies four models many
times inside one jitted function, with power-iteration state threaded through
a ``lax.fori_loop``) fully transparent to XLA.

Initializers mirror PyTorch defaults (uniform ±1/sqrt(fan_in) for
linear/conv/LSTM) so training dynamics match the reference distributionally.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, slope)


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree to ``dtype``.

    Mixed-precision contract (the TPU-native version of the AMP scaffolding
    the reference built and disabled, /root/reference/src/shared/utils.py:60-129):
    parameters and optimizer state stay float32 in the train-state pytree;
    apply functions build a bfloat16 *compute view* of the weights with this
    helper at trace time. The cast's transpose restores float32 gradients, so
    Adam statistics remain full precision. XLA fuses the casts into the
    surrounding matmuls — no extra HBM round-trip."""
    dtype = jnp.dtype(dtype)
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------


def dense_init(key, in_dim: int, out_dim: int) -> Dict[str, jnp.ndarray]:
    """Linear layer params; torch ``nn.Linear`` default init (kaiming-uniform
    a=sqrt(5) → U(±1/sqrt(fan_in)) for both weight and bias)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    return {"w": _uniform(kw, (in_dim, out_dim), bound), "b": _uniform(kb, (out_dim,), bound)}


def dense(params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


# ---------------------------------------------------------------------------
# Spectral normalization (power iteration, torch semantics)
# ---------------------------------------------------------------------------
#
# torch's spectral_norm runs ONE power-iteration per training forward and
# normalizes W by sigma = u^T W v, differentiating through sigma w.r.t. W but
# not through u/v (buffers). Here u lives in a separate *state* pytree
# threaded through the train step — the reference's mutable-buffer behavior
# (reference models.py:194,198,270-291) made functional.


def _l2n(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


def spectral_init(key, w_shape_2d: Tuple[int, int]) -> jnp.ndarray:
    """Initial left-singular estimate u for a (fan_in, fan_out) matrix."""
    return _l2n(jax.random.normal(key, (w_shape_2d[1],), jnp.float32))


def spectral_normalize(w2d: jnp.ndarray, u: jnp.ndarray, update: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One power-iteration step + weight normalization.

    Args:
        w2d: (fan_in, fan_out) weight viewed as a matrix.
        u: (fan_out,) current estimate of the top left-singular vector.
        update: run the power iteration (training) or reuse u (eval).

    Returns:
        (w2d / sigma, new_u)
    """
    if update:
        v = _l2n(w2d @ u)                       # (fan_in,)
        u = _l2n(v @ w2d)                       # (fan_out,)
    else:
        v = _l2n(w2d @ u)
    u_c = jax.lax.stop_gradient(u)
    v_c = jax.lax.stop_gradient(v)
    sigma = v_c @ w2d @ u_c
    return w2d / sigma, u


def sn_dense_init(key, in_dim: int, out_dim: int):
    """Spectrally-normalized dense: (params, u_state)."""
    kp, ku = jax.random.split(key)
    return dense_init(kp, in_dim, out_dim), spectral_init(ku, (in_dim, out_dim))


def sn_dense(params, u, x, update: bool, dtype=None):
    """Spectral normalization runs in float32 (the power iteration's rsqrt is
    precision-sensitive and O(fan_in·fan_out) — negligible); the matmul itself
    runs in ``dtype`` when given (bf16 on the MXU)."""
    w_sn, u_new = spectral_normalize(params["w"], u, update)
    b = params["b"]
    if dtype is not None and w_sn.dtype != jnp.dtype(dtype):
        w_sn = w_sn.astype(dtype)
        b = b.astype(dtype)
    return x @ w_sn + b, u_new


# ---------------------------------------------------------------------------
# Conv1d (NWC layout; torch-equivalent shapes/padding)
# ---------------------------------------------------------------------------


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int) -> Dict[str, jnp.ndarray]:
    """torch ``nn.Conv1d`` default init: U(±1/sqrt(in_ch * kernel))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_ch * kernel)
    return {
        "w": _uniform(kw, (kernel, in_ch, out_ch), bound),   # WIO
        "b": _uniform(kb, (out_ch,), bound),
    }


def conv1d(params, x: jnp.ndarray, stride: int = 1, padding: int = 0) -> jnp.ndarray:
    """x: (B, L, C_in) → (B, L', C_out)."""
    out = jax.lax.conv_general_dilated(
        x, params["w"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + params["b"]


def sn_conv1d_init(key, in_ch: int, out_ch: int, kernel: int):
    """Spectrally-normalized conv1d: (params, u_state). The kernel is viewed
    as a (kernel*in_ch, out_ch) matrix for power iteration, matching torch's
    (out_ch, in_ch*kernel) flattening."""
    kp, ku = jax.random.split(key)
    params = conv1d_init(kp, in_ch, out_ch, kernel)
    return params, spectral_init(ku, (kernel * in_ch, out_ch))


def sn_conv1d(params, u, x, stride: int, padding: int, update: bool, dtype=None):
    w = params["w"]
    w2d = w.reshape(-1, w.shape[-1])
    w_sn2d, u_new = spectral_normalize(w2d, u, update)   # power iteration in fp32
    w_sn = w_sn2d.reshape(w.shape)
    b = params["b"]
    if dtype is not None and w_sn.dtype != jnp.dtype(dtype):
        w_sn = w_sn.astype(dtype)
        b = b.astype(dtype)
    out = jax.lax.conv_general_dilated(
        x, w_sn,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b, u_new


# ---------------------------------------------------------------------------
# BatchNorm (functional; running-stats state threaded explicitly)
# ---------------------------------------------------------------------------


def batchnorm_init(dim: int):
    params = {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}
    state = {"mean": jnp.zeros((dim,), jnp.float32), "var": jnp.ones((dim,), jnp.float32)}
    return params, state


def batchnorm(params, state, x, train: bool, momentum: float = 0.1, eps: float = 1e-5,
              axis_name: Optional[str] = None):
    """Normalize over all axes but the last. In training mode returns updated
    running stats (torch momentum convention: new = (1-m)*old + m*batch).
    When ``axis_name`` is set, batch statistics are all-reduced over that mesh
    axis so data-parallel training sees global statistics."""
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.var(x, axis=reduce_axes)
        n = x.size // x.shape[-1]
        if axis_name is not None:
            local_mean = mean
            mean = jax.lax.pmean(mean, axis_name)
            # E[x^2] - E[x]^2 with globally averaged moments
            ex2 = jax.lax.pmean(var + jnp.square(local_mean), axis_name)
            var = ex2 - jnp.square(mean)
            n = n * jax.lax.psum(1, axis_name)
        unbiased = var * n / jnp.maximum(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    out = (x - mean) * inv * params["scale"] + params["bias"]
    return out, new_state


# ---------------------------------------------------------------------------
# LSTM (stacked bidirectional; fused-gate scan)
# ---------------------------------------------------------------------------
#
# TPU layout: the input projection for the *whole sequence* is one large
# (B*L, D) x (D, 4H) matmul on the MXU; the lax.scan over time only carries
# the (B, H) recurrent state and does the (B, H) x (H, 4H) hidden matmul.
# Replaces torch nn.LSTM (reference models.py:114-120) — gate order i,f,g,o.


def lstm_cell_init(key, in_dim: int, hidden: int) -> Dict[str, jnp.ndarray]:
    """torch nn.LSTM default init: every tensor U(±1/sqrt(hidden))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden)
    return {
        "w_ih": _uniform(k1, (in_dim, 4 * hidden), bound),
        "w_hh": _uniform(k2, (hidden, 4 * hidden), bound),
        "b_ih": _uniform(k3, (4 * hidden,), bound),
        "b_hh": _uniform(k4, (4 * hidden,), bound),
    }


def _lstm_scan(cell, x_proj: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """Scan the recurrence over time. x_proj: (L, B, 4H) precomputed input
    projections (+ both biases). Returns hidden states (L, B, H)."""
    w_hh = cell["w_hh"]
    B = x_proj.shape[1]
    h0 = jnp.zeros((B, hidden), x_proj.dtype)
    c0 = jnp.zeros((B, hidden), x_proj.dtype)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # unroll left at 1: unroll=4 is ~18% faster for forward-only passes but
    # pessimizes the backward enough to slow the full two-cycle train step
    # (fp32: 2.82s vs 2.64s per epoch on v5e; bf16: unroll=2 gives 2.36s vs
    # 1.78s) — measured, not assumed. Batching the critic loop's two G
    # forwards into one 2B apply also loses (1.90s vs 1.78s bf16): the
    # per-step matmuls scale sub-linearly but not enough to beat scan count.
    _, hs = jax.lax.scan(step, (h0, c0), x_proj)
    return hs


def lstm_layer_apply(cell, x: jnp.ndarray, hidden: int, reverse: bool = False) -> jnp.ndarray:
    """One direction of one LSTM layer. x: (B, L, D) → (B, L, H)."""
    if reverse:
        x = jnp.flip(x, axis=1)
    # One MXU matmul for all timesteps' input projections.
    x_proj = x @ cell["w_ih"] + (cell["b_ih"] + cell["b_hh"])
    hs = _lstm_scan(cell, jnp.swapaxes(x_proj, 0, 1), hidden)   # (L, B, H)
    hs = jnp.swapaxes(hs, 0, 1)
    if reverse:
        hs = jnp.flip(hs, axis=1)
    return hs


def bilstm_init(key, in_dim: int, hidden: int, num_layers: int) -> List[Dict]:
    """Stacked bidirectional LSTM params: list of {'fwd': cell, 'bwd': cell}."""
    layers = []
    d = in_dim
    for i in range(num_layers):
        kf, kb, key = jax.random.split(key, 3)
        layers.append({
            "fwd": lstm_cell_init(kf, d, hidden),
            "bwd": lstm_cell_init(kb, d, hidden),
        })
        d = 2 * hidden
    return layers


def bilstm_apply(layers: List[Dict], x: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """Stacked BiLSTM: (B, L, D) → (B, L, 2H)."""
    h = x
    for layer in layers:
        fwd = lstm_layer_apply(layer["fwd"], h, hidden, reverse=False)
        bwd = lstm_layer_apply(layer["bwd"], h, hidden, reverse=True)
        h = jnp.concatenate([fwd, bwd], axis=-1)
    return h
