"""Large-scale distribution metrics (BASELINE.json config 4: 100k generated
gestures).

At n = 100k the reference's eval recipe is infeasible — Hungarian assignment
is O(n^3) and even materializing the n x n distance matrix is 40 GB. These
device-friendly estimators replace it:

* sliced Wasserstein-2: project flattened gestures onto random directions,
  sort, average 1-D W2 — O(K · n log n), all on device;
* chunked k-NN precision/recall: stream the cross-distance matrix in row
  blocks, keeping only per-sample "covered" booleans;
* energy distance: an unbiased two-sample statistic from subsampled pair
  batches;
* Sinkhorn matched cost: the Hungarian "Wasserstein" scalar's on-device
  estimator (entropy-regularized OT on a subsample — the full n x n cost
  matrix caps the subsample size, not the assignment solve);
* FID works unchanged (feature moments are O(n · d)).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.assignment import sinkhorn_matching_cost
from ..ops.stats import pairwise_l2


def sliced_wasserstein2(
    a: jnp.ndarray,
    b: jnp.ndarray,
    n_projections: int = 128,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Sliced W2 between row sets a (n, D) and b (m, D) with n == m.

    Averages the exact 1-D squared-Wasserstein distance over random unit
    projections; returns its square root (same units as L2)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    D = a.shape[1]
    dirs = jax.random.normal(key, (D, n_projections))
    dirs = dirs / jnp.linalg.norm(dirs, axis=0, keepdims=True)
    pa = jnp.sort(a @ dirs, axis=0)        # (n, K)
    pb = jnp.sort(b @ dirs, axis=0)
    return jnp.sqrt(jnp.mean((pa - pb) ** 2))


def energy_distance(
    a: jnp.ndarray,
    b: jnp.ndarray,
    n_pairs: int = 1 << 20,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Monte-Carlo energy distance: 2 E|X-Y| - E|X-X'| - E|Y-Y'| over
    ``n_pairs`` uniformly sampled pairs per term."""
    key = key if key is not None else jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n, m = a.shape[0], b.shape[0]

    def mean_dist(x, y, ki, kj, distinct=False):
        i = jax.random.randint(ki, (n_pairs,), 0, x.shape[0])
        if distinct:
            # Within-set terms estimate E|X-X'| over INDEPENDENT draws:
            # allowing i==j contributes distance 0 with probability 1/n and
            # biases the term low (the statistic high) — offset j so j != i.
            j = (i + jax.random.randint(kj, (n_pairs,), 1, y.shape[0])) % y.shape[0]
        else:
            j = jax.random.randint(kj, (n_pairs,), 0, y.shape[0])
        d = x[i] - y[j]
        return jnp.sqrt(jnp.sum(d * d, axis=-1)).mean()

    return (
        2.0 * mean_dist(a, b, k1, k2)
        - mean_dist(a, a, k1, k3, distinct=True)
        - mean_dist(b, b, k2, k4, distinct=True)
    )


_BIG = 1e30


def _pad_rows(x: np.ndarray, chunk: int) -> np.ndarray:
    from ..utils.chunking import pad_to_chunks

    return pad_to_chunks(x, chunk, -(-len(x) // chunk), x.dtype)


@partial(jax.jit, static_argnames=("k", "row_chunk"))
def _knn_radii_scanned(x: jnp.ndarray, n_valid: jnp.ndarray, k: int, row_chunk: int):
    """Per-sample distance to the k-th same-set neighbor, row-chunk scan.
    Rows beyond ``n_valid`` (padding) get radius -BIG (cover nothing);
    padded columns are masked to +BIG so they never count as neighbors."""
    X = x.shape[0]
    col_ok = jnp.arange(X) < n_valid

    def body(_, c):
        rows = jax.lax.dynamic_slice_in_dim(x, c * row_chunk, row_chunk)
        d = jnp.where(col_ok[None, :], pairwise_l2(rows, x), _BIG)
        return None, -jax.lax.top_k(-d, k + 1)[0][:, k]

    _, r = jax.lax.scan(body, None, jnp.arange(X // row_chunk, dtype=jnp.int32))
    r = r.reshape(X)
    return jnp.where(jnp.arange(X) < n_valid, r, -_BIG)


@partial(jax.jit, static_argnames=("row_chunk",))
def _knn_coverage_scanned(real: jnp.ndarray, fake: jnp.ndarray,
                          real_radii: jnp.ndarray, fake_radii: jnp.ndarray,
                          row_chunk: int):
    """covered_fake[j] = any_i d(real_i, fake_j) <= real_radii[i];
    covered_real[i] = any_j d <= fake_radii[j]. One scan over real chunks."""
    N = real.shape[0]

    def body(covered_fake, c):
        rows = jax.lax.dynamic_slice_in_dim(real, c * row_chunk, row_chunk)
        rr = jax.lax.dynamic_slice_in_dim(real_radii, c * row_chunk, row_chunk)
        d = pairwise_l2(rows, fake)                         # (chunk, M)
        covered_fake = covered_fake | jnp.any(d <= rr[:, None], axis=0)
        covered_real_chunk = jnp.any(d <= fake_radii[None, :], axis=1)
        return covered_fake, covered_real_chunk

    covered_fake0 = jnp.zeros(fake.shape[0], bool)
    covered_fake, covered_real = jax.lax.scan(
        body, covered_fake0, jnp.arange(N // row_chunk, dtype=jnp.int32))
    return covered_fake, covered_real.reshape(N)


def chunked_knn_precision_recall(
    real_flat: np.ndarray,
    fake_flat: np.ndarray,
    k: int = 3,
    row_chunk: int = 2048,
) -> Tuple[float, float]:
    """k-NN manifold precision/recall without materializing n x m matrices.

    Radii: per-sample distance to the k-th same-set neighbor; coverage: a
    running OR over row blocks. Both passes run as single scanned device
    programs (a host chunk loop costs one dispatch round-trip per block —
    ~150 of them at 100k scale through a remote-TPU link)."""
    n_real, n_fake = len(real_flat), len(fake_flat)
    row_chunk = min(row_chunk, max(n_real, 1), max(n_fake, 1))
    real_d = jnp.asarray(_pad_rows(np.asarray(real_flat, np.float32), row_chunk))
    fake_d = jnp.asarray(_pad_rows(np.asarray(fake_flat, np.float32), row_chunk))

    real_radii = _knn_radii_scanned(real_d, jnp.int32(n_real), k, row_chunk)
    fake_radii = _knn_radii_scanned(fake_d, jnp.int32(n_fake), k, row_chunk)
    covered_fake, covered_real = _knn_coverage_scanned(
        real_d, fake_d, real_radii, fake_radii, row_chunk)

    precision = float(np.asarray(covered_fake)[:n_fake].mean())
    recall = float(np.asarray(covered_real)[:n_real].mean())
    return precision, recall


def sinkhorn_matched_cost_subsampled(
    real_flat: jnp.ndarray,
    fake_flat: jnp.ndarray,
    n_sub: int = 4096,
    epsilon: float = 0.01,
    key: Optional[jax.Array] = None,
) -> float:
    """On-device estimator of the reference's Hungarian matched mean distance
    (src/gan/evaluation.py:338): entropy-regularized OT between uniform
    marginals on an ``n_sub`` subsample of each set. Validated against the
    exact Hungarian solve at small n in tests/test_large_scale.py.

    Single draw — prefer ``sinkhorn_matched_cost_repeated`` for a variance
    estimate at production scale."""
    key = key if key is not None else jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    n = min(n_sub, real_flat.shape[0], fake_flat.shape[0])
    ri = jax.random.choice(k1, real_flat.shape[0], (n,), replace=False)
    fi = jax.random.choice(k2, fake_flat.shape[0], (n,), replace=False)
    cost = pairwise_l2(jnp.take(real_flat, ri, axis=0), jnp.take(fake_flat, fi, axis=0))
    return float(sinkhorn_matching_cost(cost, epsilon=epsilon))


def sinkhorn_matched_cost_repeated(
    real_flat: jnp.ndarray,
    fake_flat: jnp.ndarray,
    n_sub: int = 4096,
    epsilon: float = 0.01,
    key: Optional[jax.Array] = None,
    n_repeats: int = 5,
) -> Tuple[float, float, np.ndarray]:
    """Repeat the subsampled Sinkhorn matched-cost estimator over
    ``n_repeats`` independent subsamples and return (mean, std, values).

    The repeats run sequentially (one n_sub² cost matrix on device at a
    time — vmapping K repeats would multiply peak HBM by K for no wall-clock
    win; the solve is compute-bound). Estimator bias vs the exact Hungarian
    scalar is validated in tests/test_large_scale.py."""
    key = key if key is not None else jax.random.PRNGKey(2)
    values = np.array([
        sinkhorn_matched_cost_subsampled(real_flat, fake_flat, n_sub, epsilon, k)
        for k in jax.random.split(key, n_repeats)
    ])
    return float(values.mean()), float(values.std(ddof=1) if n_repeats > 1 else 0.0), values


def sinkhorn_matched_cost_extrapolated(
    real_flat: jnp.ndarray,
    fake_flat: jnp.ndarray,
    n_sub: int = 4096,
    epsilon: float = 0.01,
    key: Optional[jax.Array] = None,
    n_repeats: int = 6,
) -> Dict[str, float]:
    """Subsample-bias-corrected matched-cost estimate.

    The matched mean distance at subsample size n overestimates the
    full-population value: OT matched costs converge as c_N + b·n^(-1/d),
    which over moderate ranges in high dimension is locally LINEAR in
    log2(n) (measured on 16-d Gaussians: per-doubling deltas
    0.178/0.161/0.159/0.152 from n=128→2048 — constant to ~15%). Estimate
    at n_sub and n_sub/2 (K repeats each) and extrapolate the log2-linear
    trend to the full population size; on the measurement above this
    recovers the exact Hungarian scalar to 0.2% where the raw n_sub=512
    subsample is 8% high.

    Returns {'estimate', 'stderr', 'raw_mean', 'raw_std', 'slope'};
    ``stderr`` propagates the subsample spread through the extrapolation.
    """
    key = key if key is not None else jax.random.PRNGKey(2)
    pop = min(real_flat.shape[0], fake_flat.shape[0])
    n_sub = min(n_sub, pop)

    if n_sub >= pop:
        # Subsample is the population: no bias to correct.
        mean_n, std_n, _ = sinkhorn_matched_cost_repeated(
            real_flat, fake_flat, n_sub, epsilon, key, n_repeats)
        return {"estimate": mean_n, "stderr": std_n / np.sqrt(max(n_repeats, 1)),
                "raw_mean": mean_n, "raw_std": std_n, "slope": 0.0}

    # Nested paired draws: both sizes share one permutation per repeat, so
    # the per-repeat slope (cost drop per doubling) cancels part of the
    # subsample-draw noise.
    fulls, slopes = [], []
    for k in jax.random.split(key, n_repeats):
        k1, k2 = jax.random.split(k)
        ri = jax.random.permutation(k1, real_flat.shape[0])[:n_sub]
        fi = jax.random.permutation(k2, fake_flat.shape[0])[:n_sub]
        sub_r = jnp.take(real_flat, ri, axis=0)
        sub_f = jnp.take(fake_flat, fi, axis=0)
        c_full = float(sinkhorn_matching_cost(pairwise_l2(sub_r, sub_f), epsilon=epsilon))
        c_half = float(sinkhorn_matching_cost(
            pairwise_l2(sub_r[: n_sub // 2], sub_f[: n_sub // 2]), epsilon=epsilon))
        fulls.append(c_full)
        slopes.append(c_half - c_full)

    fulls, slopes = np.array(fulls), np.array(slopes)
    doublings = float(np.log2(pop / n_sub))
    estimate = fulls.mean() - slopes.mean() * doublings
    per_repeat = fulls - slopes * doublings
    stderr = per_repeat.std(ddof=1) / np.sqrt(n_repeats) if n_repeats > 1 else 0.0
    return {
        "estimate": float(estimate),
        "stderr": float(stderr),
        "raw_mean": float(fulls.mean()),
        "raw_std": float(fulls.std(ddof=1)) if n_repeats > 1 else 0.0,
        "slope": float(slopes.mean()),
    }


def evaluate_large_scale(
    real_gestures: np.ndarray,
    fake_gestures: np.ndarray,
    ae_params=None,
    n_projections: int = 256,
    knn_k: int = 3,
    seed: int = 0,
) -> Dict[str, float]:
    """Distribution metrics at 100k scale: sliced W2 and energy distance on
    flattened (x, y), chunked k-NN precision/recall, and FID when a trained
    feature autoencoder is provided."""
    n = min(len(real_gestures), len(fake_gestures))
    real_xy = jnp.asarray(real_gestures[:n, :, :2].reshape(n, -1), jnp.float32)
    fake_xy = jnp.asarray(fake_gestures[:n, :, :2].reshape(n, -1), jnp.float32)

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    sk = sinkhorn_matched_cost_extrapolated(real_xy, fake_xy, key=k3)
    results = {
        "sliced_w2": float(sliced_wasserstein2(real_xy, fake_xy, n_projections, k1)),
        "energy_distance": float(energy_distance(real_xy, fake_xy, key=k2)),
        # Key semantics are stable across rounds: 'sinkhorn_matched_cost' is
        # the RAW subsample value (what pre-extrapolation runs/dashboards
        # recorded); the bias-extrapolated estimate gets its own key.
        "sinkhorn_matched_cost": sk["raw_mean"],
        "sinkhorn_matched_cost_std": sk["raw_std"],
        "sinkhorn_matched_cost_extrapolated": sk["estimate"],
        "sinkhorn_matched_cost_extrapolated_stderr": sk["stderr"],
        "n_samples": float(n),
    }

    precision, recall = chunked_knn_precision_recall(
        np.asarray(real_xy), np.asarray(fake_xy), k=knn_k
    )
    results["precision"] = precision
    results["recall"] = recall

    if ae_params is not None:
        from .fid import encode_features, fid_from_features

        real_feat = encode_features(ae_params, real_gestures[:n])
        fake_feat = encode_features(ae_params, fake_gestures[:n])
        results["fid"] = fid_from_features(real_feat, fake_feat)

    return results
