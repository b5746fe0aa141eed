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


def batched_spectral_normalize(ws2d, us, update: bool):
    """Power-iterate EVERY layer's (w2d, u) pair in one batched computation.

    Per-layer math is identical to ``spectral_normalize`` (v = l2n(W u),
    u' = l2n(v W), σ = (v_c W) u'_c): the layers are zero-padded to a common
    (fan_in, fan_out), stacked on a leading axis, and the whole critic's
    power iteration runs as three batched contractions. The per-layer form
    issues dozens of serialized tiny matvec/normalize launches — measured
    ~0.8 ms per critic forward on v5e, pure dispatch latency for
    microseconds of compute — which this collapses to ~nothing. Zero
    padding is exact for the math (zero rows/cols contribute zero to every
    product and to the norms); only the padded matmuls' fp reduction order
    can differ from the unbatched form (last-ulp).

    Args:
        ws2d: list of (fan_in_i, fan_out_i) float32 weight matrices.
        us: list of (fan_out_i,) power-iteration states.
        update: advance u (training) or reuse it (eval).

    Returns:
        ([w2d_i / σ_i], [new_u_i]) with original per-layer shapes.
    """
    n = len(ws2d)
    fan_in = max(w.shape[0] for w in ws2d)
    fan_out = max(w.shape[1] for w in ws2d)
    W = jnp.stack([jnp.pad(w, ((0, fan_in - w.shape[0]), (0, fan_out - w.shape[1])))
                   for w in ws2d])                                  # (n, I, O)
    U = jnp.stack([jnp.pad(u, (0, fan_out - u.shape[0])) for u in us])  # (n, O)

    def l2n_rows(x, eps=1e-12):   # matches _l2n per row
        return x / (jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)) + eps)

    V = l2n_rows(jnp.einsum("nio,no->ni", W, U))                    # (n, I)
    if update:
        U = l2n_rows(jnp.einsum("ni,nio->no", V, W))
    Uc = jax.lax.stop_gradient(U)
    Vc = jax.lax.stop_gradient(V)
    sigma = jnp.sum(jnp.einsum("ni,nio->no", Vc, W) * Uc, axis=1)   # (n,)
    ws_out = [ws2d[i] / sigma[i] for i in range(n)]
    us_out = [U[i, : us[i].shape[0]] for i in range(n)]
    return ws_out, us_out


def sn_dense_init(key, in_dim: int, out_dim: int):
    """Spectrally-normalized dense: (params, u_state)."""
    kp, ku = jax.random.split(key)
    return dense_init(kp, in_dim, out_dim), spectral_init(ku, (in_dim, out_dim))


# (The critics consume spectral normalization through
# batched_spectral_normalize + plain matmul/conv — per-layer sn_dense /
# sn_conv1d apply helpers were retired with that change; spectral_normalize
# remains the single-layer reference the batched form is tested against.)


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
# TPU layout: the scan over time is HBM-bandwidth-bound, so the design
# minimizes bytes touched per step (measured on v5e — batching the scan wider
# does NOT amortize: per-sample cost is flat from B=512 up, ~2.4 µs/sample/fwd):
#   * time-major (L, B, D) throughout the stack — one transpose at entry and
#     exit instead of two per layer-direction;
#   * the input projection happens INSIDE the scan step: streaming the raw
#     D-dim input (2-96 dims) costs 2-6x less HBM traffic than streaming a
#     precomputed 4H=192-dim x_proj, and the extra (B, D) x (D, 4H) matmul
#     per step is MXU-free lunch;
#   * time-constant inputs (the generator's broadcast latent z,
#     reference models.py:154-157) are projected ONCE into a loop-invariant
#     (B, 4H) `base` that XLA keeps in VMEM — they never touch the stream.
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


def _bilstm_layer_tm(layer: Dict, x_tm: jnp.ndarray, hidden: int,
                     static: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BOTH directions of one BiLSTM layer as a single fused scan.

    The per-scan-step fixed cost (~1 µs on v5e) dominates at production width,
    so the forward and time-reversed cells advance together in one scan over a
    stacked direction axis — 128 steps instead of 256 — with the direction-
    batched matmuls fused on the MXU.

    x_tm: (L, B, D) raw time-major input (NOT pre-projected; streaming the
    D-dim input beats streaming a precomputed 4H-dim projection).
    ``static``: optional (B, D_static) time-constant input occupying the LAST
    D_static rows of w_ih (the generator appends z feature-wise, reference
    models.py:154-157); projected once into the loop-invariant gate base.
    Returns (L, B, 2H): [forward ‖ backward] features per timestep."""
    D = x_tm.shape[-1]
    w_seq = jnp.stack([layer["fwd"]["w_ih"][:D], layer["bwd"]["w_ih"][:D]])    # (2, D, 4H)
    w_hh = jnp.stack([layer["fwd"]["w_hh"], layer["bwd"]["w_hh"]])             # (2, H, 4H)
    bias = jnp.stack([layer["fwd"]["b_ih"] + layer["fwd"]["b_hh"],
                      layer["bwd"]["b_ih"] + layer["bwd"]["b_hh"]])            # (2, 4H)
    if static is not None:
        w_st = jnp.stack([layer["fwd"]["w_ih"][D:], layer["bwd"]["w_ih"][D:]])
        base = jnp.einsum("bi,dig->dbg", static, w_st) + bias[:, None, :]      # (2, B, 4H)
    else:
        base = bias[:, None, :]                                                # (2, 1, 4H)

    B = x_tm.shape[1]
    xs = jnp.stack([x_tm, jnp.flip(x_tm, axis=0)], axis=1)                     # (L, 2, B, D)
    h0 = jnp.zeros((2, B, hidden), x_tm.dtype)
    c0 = jnp.zeros((2, B, hidden), x_tm.dtype)

    def step(carry, xt):
        h, c = carry
        gates = base + jnp.einsum("dbi,dig->dbg", xt, w_seq) + jnp.einsum(
            "dbh,dhg->dbg", h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    # Full remat on the step: the scan VJP is residual-bandwidth-bound —
    # storing every gate activation per step costs more HBM traffic in the
    # backward than recomputing the gates from the stored (h, c) carry.
    # Measured on v5e (B=512, bf16, all-leaf grads forced): fwd+bwd
    # 5.43 ms → 3.51 ms. dots_saveable is WORSE (5.96 ms — it stores the
    # matmul outputs, which are the bulk of the traffic), and scan unroll
    # 2/4/8 all lose (7.3/6.0/7.2 ms vs 5.3 at unroll=1). Forward-only
    # passes are unaffected (checkpoint is an identity without
    # differentiation).
    _, hs = jax.lax.scan(jax.checkpoint(step), (h0, c0), xs)                   # (L, 2, B, H)
    return jnp.concatenate([hs[:, 0], jnp.flip(hs[:, 1], axis=0)], axis=-1)


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


def bilstm_apply(layers: List[Dict], x: jnp.ndarray, hidden: int,
                 static: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Stacked BiLSTM: (B, L, D) → (B, L, 2H).

    ``static``: optional (B, D_static) time-constant extra input to the FIRST
    layer (appended feature-wise after the sequence input, matching
    ``bilstm_init(in_dim=D + D_static, ...)``). Semantically identical to
    concatenating ``static`` broadcast along L — but it never enters the
    scanned stream (see the layout notes above)."""
    h = jnp.swapaxes(x, 0, 1)                                   # time-major
    for i, layer in enumerate(layers):
        h = _bilstm_layer_tm(layer, h, hidden, static=static if i == 0 else None)
    return jnp.swapaxes(h, 0, 1)
