"""Time-aware gesture dynamics metrics, fully batched.

Vectorized re-design of the reference's per-pair Python loops
(/root/reference/src/gan/evaluation.py:55-294): velocities, accelerations,
and jerk as true d/dt finite differences with the same epsilon guards, and
per-pair Pearson correlations with the same percentile clipping and
validity filtering — computed for all pairs in one fused XLA call.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def time_aware_velocity(gestures: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(n, L, 3) → velocity (n, L-1, 2) at segment midpoints, midpoint times
    (n, L-1). dt guarded as in reference evaluation.py:81."""
    xy = gestures[:, :, :2]
    t = gestures[:, :, 2]
    dxy = jnp.diff(xy, axis=1)
    dt = jnp.diff(t, axis=1)
    t_mid = (t[:, :-1] + t[:, 1:]) / 2.0
    dt_safe = jnp.where(jnp.abs(dt) > 1e-10, dt, 1e-10 * jnp.sign(dt + 1e-20))
    return dxy / dt_safe[:, :, None], t_mid


def time_aware_acceleration(gestures: jnp.ndarray) -> jnp.ndarray:
    """(n, L, 3) → acceleration (n, L-2, 2) (reference evaluation.py:89-118)."""
    velocity, t_mid = time_aware_velocity(gestures)
    dv = jnp.diff(velocity, axis=1)
    dt_mid = jnp.diff(t_mid, axis=1)
    dt_safe = jnp.where(jnp.abs(dt_mid) > 1e-10, dt_mid, 1e-10 * jnp.sign(dt_mid + 1e-20))
    return dv / dt_safe[:, :, None]


def time_aware_jerk(gestures: jnp.ndarray) -> jnp.ndarray:
    """(n, L, 3) → per-gesture mean |d³xy/dt³| (reference evaluation.py:121-154)."""
    velocity, t_mid = time_aware_velocity(gestures)
    acceleration = time_aware_acceleration(gestures)
    t_acc = (t_mid[:, :-1] + t_mid[:, 1:]) / 2.0
    da = jnp.diff(acceleration, axis=1)
    dt_acc = jnp.diff(t_acc, axis=1)
    dt_safe = jnp.where(jnp.abs(dt_acc) > 1e-10, dt_acc, 1e-10)
    jerk = da / dt_safe[:, :, None]
    return jnp.sqrt(jnp.sum(jerk * jerk, axis=-1)).mean(axis=1)


def _pearson_rows(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise Pearson correlation of (n, K) against (n, K) → (n,)."""
    am = a - a.mean(axis=1, keepdims=True)
    bm = b - b.mean(axis=1, keepdims=True)
    num = (am * bm).sum(axis=1)
    den = jnp.sqrt((am * am).sum(axis=1) * (bm * bm).sum(axis=1))
    return num / den


def _masked_mean_corr(a, b, corr_valid) -> jnp.ndarray:
    corr = _pearson_rows(a, b)
    valid = corr_valid & jnp.isfinite(corr)
    count = valid.sum()
    return jnp.where(count > 0, jnp.where(valid, corr, 0.0).sum() / jnp.maximum(count, 1), 0.0)


def _clip_rows_percentile(x: jnp.ndarray, lo_pct, hi_pct) -> jnp.ndarray:
    lo = jnp.percentile(x, lo_pct, axis=1, keepdims=True) if lo_pct is not None else None
    hi = jnp.percentile(x, hi_pct, axis=1, keepdims=True)
    if lo is None:
        return jnp.minimum(jnp.maximum(x, 0.0), hi)
    return jnp.clip(x, lo, hi)


def velocity_correlation(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    """Mean per-pair correlation of flattened velocity vectors, 1-99 pct
    clipped; pairs with ~zero variance excluded (evaluation.py:157-189)."""
    vr, _ = time_aware_velocity(real)
    vf, _ = time_aware_velocity(fake)
    vr = vr.reshape(vr.shape[0], -1)
    vf = vf.reshape(vf.shape[0], -1)
    valid = (vr.std(axis=1) > 1e-10) & (vf.std(axis=1) > 1e-10)
    return _masked_mean_corr(
        _clip_rows_percentile(vr, 1, 99), _clip_rows_percentile(vf, 1, 99), valid
    )


def acceleration_correlation(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    """(evaluation.py:192-220)."""
    ar = time_aware_acceleration(real).reshape(real.shape[0], -1)
    af = time_aware_acceleration(fake).reshape(fake.shape[0], -1)
    valid = (ar.std(axis=1) > 1e-10) & (af.std(axis=1) > 1e-10)
    return _masked_mean_corr(
        _clip_rows_percentile(ar, 1, 99), _clip_rows_percentile(af, 1, 99), valid
    )


def speed_profile_correlation(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    """Correlation of |v| profiles, clipped to [0, p99] (evaluation.py:223-261)."""
    vr, _ = time_aware_velocity(real)
    vf, _ = time_aware_velocity(fake)
    sr = jnp.sqrt(jnp.sum(vr * vr, axis=-1))
    sf = jnp.sqrt(jnp.sum(vf * vf, axis=-1))
    valid = (sr.std(axis=1) > 1e-10) & (sf.std(axis=1) > 1e-10)
    return _masked_mean_corr(
        _clip_rows_percentile(sr, None, 99), _clip_rows_percentile(sf, None, 99), valid
    )


def time_delta_correlation(real: jnp.ndarray, fake: jnp.ndarray) -> jnp.ndarray:
    """Correlation of diff(t) patterns, unclipped (evaluation.py:264-294)."""
    dtr = jnp.diff(real[:, :, 2], axis=1)
    dtf = jnp.diff(fake[:, :, 2], axis=1)
    valid = (dtr.std(axis=1) > 1e-10) & (dtf.std(axis=1) > 1e-10)
    return _masked_mean_corr(dtr, dtf, valid)


def pairwise_l2(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean cdist between flattened feature rows: (n, K), (m, K) → (n, m),
    cross term on the MXU (replaces scipy cdist, evaluation.py:337,476-480)."""
    a2 = jnp.sum(a * a, axis=1)
    b2 = jnp.sum(b * b, axis=1)
    sq = a2[:, None] + b2[None, :] - 2.0 * (a @ b.T)
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def knn_precision_recall(
    real_flat: jnp.ndarray, fake_flat: jnp.ndarray, k: int,
    real_dists: jnp.ndarray = None, real_radii: jnp.ndarray = None,
    cross: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k-NN manifold precision/recall (reference evaluation.py:470-488).

    radius_i = distance to the k-th same-set neighbor (sorted row, index k —
    which includes the self-distance 0 at index 0, as in the reference).
    precision = fraction of fakes within any real ball; recall = fraction of
    reals within any fake ball. Returns (precision, recall, real_dists,
    real_radii) so the real side can be cached across model evals. ``cross``
    accepts a precomputed (n_real, n_fake) real↔fake distance matrix (the
    metric suite already builds it for the Hungarian match).
    """
    if real_dists is None:
        real_dists = pairwise_l2(real_flat, real_flat)
        real_radii = jnp.sort(real_dists, axis=1)[:, k]
    fake_dists = pairwise_l2(fake_flat, fake_flat)
    fake_radii = jnp.sort(fake_dists, axis=1)[:, k]
    if cross is None:
        cross = pairwise_l2(real_flat, fake_flat)               # (n, m)

    precision = jnp.any(cross <= real_radii[:, None], axis=0).mean()
    recall = jnp.any(cross <= fake_radii[None, :], axis=1).mean()
    return precision, recall, real_dists, real_radii
