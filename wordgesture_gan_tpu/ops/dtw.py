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
    """Exact DTW distances from per-pair cost matrices via a row sweep with
    parallel prefix scans. cost: (P, L, L) → (P,).

    The classic recurrence
        D[i, j] = c[i, j] + min(D[i-1, j], D[i-1, j-1], D[i, j-1])
    couples cells along j, but letting M[j] = min(D[i-1, j], D[i-1, j-1])
    and S[j] = prefix-sum of row c[i] gives the closed form
        D[i, j] = S[j] + cummin_j(M[j] - S[j-1]),
    so each row is two log-depth scans (cumsum, cummin) plus elementwise
    mins — no gathers, no anti-diagonal bookkeeping, 128 sequential steps
    instead of 255, fully vectorized over the pair axis on the VPU.
    """
    P, L, _ = cost.shape

    def shift_right(x, fill):
        return jnp.concatenate([jnp.full((P, 1), fill, x.dtype), x[:, :-1]], axis=1)

    def row_step(d_prev, c_row):
        # c_row: (P, L) — costs of this row; d_prev: (P, L) — previous row's D.
        m = jnp.minimum(d_prev, shift_right(d_prev, _BIG))       # min(up, diag)
        s = jnp.cumsum(c_row, axis=1)                            # prefix sums
        u = m - shift_right(s, 0.0)                              # M[j] - S[j-1]
        d_new = s + jax.lax.cummin(u, axis=1)
        return d_new, None

    # Row 0: D[0, j] = prefix-sum of c[0, :j] (only left moves).
    d0 = jnp.cumsum(cost[:, 0, :], axis=1)
    rows = jnp.moveaxis(cost[:, 1:, :], 1, 0)                    # (L-1, P, L)
    d_last, _ = jax.lax.scan(row_step, d0, rows)
    return d_last[:, L - 1]


@partial(jax.jit, static_argnames=())
def dtw_pairs(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """DTW distance for aligned pairs. x, y: (P, L, D) → (P,)."""
    return _dtw_from_cost(_pairwise_sq_dists(x, y))


def dtw_distance_matrix(
    real: np.ndarray,
    fake: np.ndarray,
    pair_chunk: int = 4096,
    use_pallas: str = "auto",
) -> np.ndarray:
    """Full (n, m) DTW distance matrix between two gesture sets, computed in
    device-resident pair chunks. real: (n, L, D), fake: (m, L, D).

    ``use_pallas``: "auto" uses the Pallas TPU kernel on TPU backends
    (~2x the XLA row sweep), "never"/"always" force a path. With n = m =
    2000 that is ~4M pair-DTWs at ≈145k DTW/s on one v5e.
    """
    n, m = len(real), len(fake)
    L, D = real.shape[1], real.shape[2]
    real_d = jnp.asarray(real[:, :, :D], jnp.float32)
    fake_d = jnp.asarray(fake[:, :, :D], jnp.float32)

    flat_out = np.empty(n * m, dtype=np.float32)
    idx = np.arange(n * m)

    if use_pallas == "always":
        pallas_ok = True
    elif use_pallas == "never":
        pallas_ok = False
    else:
        from .dtw_pallas import pallas_dtw_available

        pallas_ok = pallas_dtw_available() and L >= 8 and D == 2

    if pallas_ok:
        from .dtw_pallas import dtw_pairs_pallas

        chunked = jax.jit(lambda xi, yi: dtw_pairs_pallas(
            jnp.take(real_d, xi, axis=0), jnp.take(fake_d, yi, axis=0)
        ))
    else:
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
