"""Batched on-device arc-length resampling and prototype generation.

The host pipeline keeps the bit-equivalent numpy path (data/preprocess.py);
these jit/vmap kernels are the bulk equivalents for on-device work at scale:
regenerating thousands of prototypes, resampling augmentation batches, or
feeding the variable-length pipeline without host round-trips
(BASELINE.json north star: preprocessing as fused jit kernels).

Inputs are padded to static shapes with per-row valid lengths — the standard
TPU ragged-data pattern.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

def _arclength_resample_one(points: jnp.ndarray, n_valid: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Resample one padded polyline at uniform arc length.

    points: (N_max, D) with rows >= n_valid ignored; n_valid >= 2.
    Returns (out_len, D). Matches the host resampler's clamp semantics
    (segment fraction clipped to [0, 1], degenerate segments -> fraction 0).
    """
    N, D = points.shape
    idx_row = jnp.arange(N)
    valid_seg = idx_row[:-1] < (n_valid - 1)                 # segment i uses points i, i+1

    diffs = jnp.diff(points[:, :2], axis=0)
    seg_len = jnp.sqrt(jnp.sum(diffs * diffs, axis=1)) * valid_seg
    cum = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(seg_len)])
    total = cum[-1]

    targets = jnp.linspace(0.0, 1.0, out_len) * total
    seg_idx = jnp.clip(jnp.searchsorted(cum, targets, side="right") - 1, 0, N - 2)
    # keep the index inside the valid range
    seg_idx = jnp.minimum(seg_idx, jnp.maximum(n_valid - 2, 0))

    seg_start = cum[seg_idx]
    span = cum[seg_idx + 1] - seg_start
    frac = jnp.where(span > 1e-6, (targets - seg_start) / span, 0.0)
    frac = jnp.clip(frac, 0.0, 1.0)

    p0 = points[seg_idx]
    p1 = points[seg_idx + 1]
    out = p0 + frac[:, None] * (p1 - p0)

    # Degenerate trace (total arc length ~ 0): repeat the first point.
    return jnp.where(total > 1e-6, out, jnp.broadcast_to(points[0], (out_len, D)))


@partial(jax.jit, static_argnames=("out_len",))
def batched_arclength_resample(
    points: jnp.ndarray,      # (B, N_max, D) padded polylines
    n_valid: jnp.ndarray,     # (B,) true vertex counts (>= 2)
    out_len: int = 128,
) -> jnp.ndarray:
    """Uniform-arc-length resampling for a batch of padded polylines:
    (B, N_max, D) → (B, out_len, D), fully on device."""
    return jax.vmap(lambda p, n: _arclength_resample_one(p, n, out_len))(points, n_valid)


@partial(jax.jit, static_argnames=("out_len",))
def batched_word_prototypes(
    key_positions: jnp.ndarray,   # (B, K_max, 2) padded key centers per word
    n_keys: jnp.ndarray,          # (B,) true key counts
    out_len: int = 128,
) -> jnp.ndarray:
    """Straight-line prototypes for a batch of words: polyline through key
    centers resampled at uniform arc length + uniform time column
    (device equivalent of keyboard.get_word_prototype; words become padded
    key-index arrays so generation vmaps — SURVEY.md §7 step 1).

    Words with < 2 valid keys degrade to a constant-point prototype at the
    first key (zeros if none), matching the host fallbacks.
    """
    B, K, _ = key_positions.shape
    xy = batched_arclength_resample(key_positions, jnp.maximum(n_keys, 2), out_len)
    times = jnp.broadcast_to(jnp.linspace(0.0, 1.0, out_len)[None, :, None], (B, out_len, 1))

    single = jnp.broadcast_to(key_positions[:, :1, :], (B, out_len, 2))
    xy = jnp.where((n_keys >= 2)[:, None, None], xy, single)
    xy = jnp.where((n_keys >= 1)[:, None, None], xy, jnp.zeros_like(xy))
    return jnp.concatenate([xy, times], axis=-1)
