"""Batched dynamic-time-warping distance on device.

Replaces the reference's process-parallel fastdtw fan-out
(/root/reference/src/gan/evaluation.py:342-361: joblib over rows, one
Python fastdtw call per pair) with a single XLA computation: pairwise cost
matrices come from one MXU matmul per chunk, and the DP runs as an
anti-diagonal wavefront ``lax.scan`` vectorized over thousands of pairs at
once.

Note on fidelity: this computes **exact** DTW. fastdtw is an approximation
(radius=1 coarsening) that upper-bounds the exact distance; on these
128-point gesture traces the two agree closely (validated in
tests/test_metrics.py against fastdtw), with exact ≤ approx by construction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.float32(1e30)


def _pairwise_sq_dists(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pair point-distance matrices. x, y: (P, L, D) → (P, L, L) with
    cost[p, i, j] = ||x[p, i] - y[p, j]||. The cross term is a batched MXU
    matmul; the result is clipped before sqrt for numerical safety."""
    x2 = jnp.sum(x * x, axis=-1)                      # (P, L)
    y2 = jnp.sum(y * y, axis=-1)                      # (P, L)
    xy = jnp.einsum("pld,pmd->plm", x, y)             # (P, L, L) on the MXU
    sq = x2[:, :, None] + y2[:, None, :] - 2.0 * xy
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def _dtw_from_cost(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact DTW distances from per-pair cost matrices via an anti-diagonal
    wavefront. cost: (P, L, L) → (P,).

    State: the two previous diagonals as (P, L) vectors indexed by column j
    (diagonal k holds cells D[k-j, j]). Recurrence per diagonal:
        D[i, j] = cost[i, j] + min(D[i-1, j], D[i, j-1], D[i-1, j-1])
    """
    P, L, _ = cost.shape
    # Column-major view so the per-step gather indexes the trailing axis:
    # cost_j[p, j, i] = cost[p, i, j]
    cost_j = jnp.swapaxes(cost, 1, 2)
    j_idx = jnp.arange(L)

    def shift_right(d):
        return jnp.concatenate([jnp.full((P, 1), _BIG), d[:, :-1]], axis=1)

    def step(carry, k):
        d1, d2 = carry                                 # diagonals k-1, k-2
        i_idx = k - j_idx                              # row index per column
        valid = (i_idx >= 0) & (i_idx < L)
        c_k = jnp.take_along_axis(
            cost_j, jnp.clip(i_idx, 0, L - 1)[None, :, None], axis=2
        )[:, :, 0]                                     # (P, L)

        up = d1                                        # D[i-1, j]
        left = shift_right(d1)                         # D[i, j-1]
        diag = shift_right(d2)                         # D[i-1, j-1]
        best = jnp.minimum(jnp.minimum(up, left), diag)
        # Origin cell has no predecessor.
        best = jnp.where((k == 0) & (j_idx[None, :] == 0), 0.0, best)
        d_new = jnp.where(valid[None, :], c_k + best, _BIG)
        return (d_new, d1), None

    d_init = jnp.full((P, L), _BIG)
    (d_last, _), _ = jax.lax.scan(step, (d_init, d_init), jnp.arange(2 * L - 1))
    return d_last[:, L - 1]


@partial(jax.jit, static_argnames=())
def dtw_pairs(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """DTW distance for aligned pairs. x, y: (P, L, D) → (P,)."""
    return _dtw_from_cost(_pairwise_sq_dists(x, y))


def dtw_distance_matrix(
    real: np.ndarray,
    fake: np.ndarray,
    pair_chunk: int = 4096,
) -> np.ndarray:
    """Full (n, m) DTW distance matrix between two gesture sets, computed in
    device-resident pair chunks. real: (n, L, D), fake: (m, L, D).

    Each chunk materializes (chunk, L, L) cost matrices (≈ 256 MB at the
    default chunk for L=128) and runs the wavefront scan; with n = m = 2000
    that is ~4M pair-DTWs in a few hundred chunked XLA calls.
    """
    n, m = len(real), len(fake)
    L, D = real.shape[1], real.shape[2]
    real_d = jnp.asarray(real[:, :, :D], jnp.float32)
    fake_d = jnp.asarray(fake[:, :, :D], jnp.float32)

    flat_out = np.empty(n * m, dtype=np.float32)
    idx = np.arange(n * m)

    chunked = jax.jit(lambda xi, yi: dtw_pairs(
        jnp.take(real_d, xi, axis=0), jnp.take(fake_d, yi, axis=0)
    ))

    for start in range(0, n * m, pair_chunk):
        chunk = idx[start : start + pair_chunk]
        # Pad the tail chunk to a fixed size to avoid recompilation.
        pad = pair_chunk - len(chunk)
        padded = np.concatenate([chunk, np.zeros(pad, dtype=chunk.dtype)]) if pad else chunk
        xi = jnp.asarray(padded // m, jnp.int32)
        yi = jnp.asarray(padded % m, jnp.int32)
        vals = np.asarray(chunked(xi, yi))
        flat_out[start : start + len(chunk)] = vals[: len(chunk)]

    return flat_out.reshape(n, m)
