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


@partial(jax.jit, static_argnames=("m_total", "pair_chunk", "pallas"))
def _dtw_all_pairs_scanned(real_d: jnp.ndarray, fake_d: jnp.ndarray,
                           m_total: int, pair_chunk: int, pallas: bool) -> jnp.ndarray:
    """All n·m pair DTWs as ONE device program: a ``lax.scan`` over
    fixed-size pair chunks (gather → kernel). One dispatch + one D2H for the
    whole matrix — the chunk loop used to live on the host, which cost a
    dispatch round-trip per chunk (~30 ms each through a remote-TPU tunnel:
    ~977 chunks at n=m=2000 was ~29 s of pure latency)."""
    n = real_d.shape[0]
    total = n * m_total
    n_chunks = -(-total // pair_chunk)

    if pallas:
        from .dtw_pallas import dtw_pairs_pallas
        kernel = dtw_pairs_pallas
    else:
        kernel = dtw_pairs

    def body(_, c):
        flat = jnp.minimum(c * pair_chunk + jnp.arange(pair_chunk), total - 1)
        vals = kernel(jnp.take(real_d, flat // m_total, axis=0),
                      jnp.take(fake_d, flat % m_total, axis=0))
        return None, vals

    _, out = jax.lax.scan(body, None, jnp.arange(n_chunks, dtype=jnp.int32))
    return out.reshape(-1)[:total]


def dtw_distance_matrix(
    real: np.ndarray,
    fake: np.ndarray,
    pair_chunk: int = 8192,
    use_pallas: str = "auto",
) -> np.ndarray:
    """Full (n, m) DTW distance matrix between two gesture sets, computed as
    a single fused device program (scan over device-resident pair chunks).
    real: (n, L, D), fake: (m, L, D).

    ``use_pallas``: "auto" uses the Pallas TPU kernel on TPU backends
    (~2x the XLA row sweep) for D ∈ {2, 3}, "never"/"always" force a path.
    """
    n, m = len(real), len(fake)
    L, D = real.shape[1], real.shape[2]
    real_d = jnp.asarray(real[:, :, :D], jnp.float32)
    fake_d = jnp.asarray(fake[:, :, :D], jnp.float32)

    if use_pallas == "always":
        if D not in (2, 3):
            raise ValueError(
                f"use_pallas='always' requires 2- or 3-feature gestures "
                f"(x, y[, t]); got D={D}.")
        pallas_ok = True
    elif use_pallas == "never":
        pallas_ok = False
    else:
        from .dtw_pallas import pallas_dtw_available

        pallas_ok = pallas_dtw_available() and L >= 8 and D in (2, 3)
        if pallas_dtw_available() and not pallas_ok:
            # Loud fallback: a silent 2x perf regression on unusual shapes
            # is a trap for future feature-augmented evals.
            import warnings

            warnings.warn(
                f"dtw_distance_matrix: falling back to the XLA row sweep "
                f"(Pallas kernel needs L >= 8 and D in (2, 3); got L={L}, "
                f"D={D})", stacklevel=2)

    flat = np.asarray(_dtw_all_pairs_scanned(
        real_d, fake_d, m_total=m, pair_chunk=min(pair_chunk, n * m), pallas=pallas_ok
    ))
    return flat.reshape(n, m)
