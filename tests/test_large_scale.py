"""Large-scale metric estimator tests (BASELINE config 4 machinery)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from wordgesture_gan_tpu.metrics.large_scale import (
    chunked_knn_precision_recall,
    energy_distance,
    evaluate_large_scale,
    sliced_wasserstein2,
)


@pytest.fixture(scope="module")
def sets():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (400, 64)).astype(np.float32)
    b = rng.normal(0, 1, (400, 64)).astype(np.float32)
    shifted = (a + 2.0).astype(np.float32)
    return a, b, shifted


def test_sliced_w2_properties(sets):
    a, b, shifted = sets
    same = float(sliced_wasserstein2(jnp.asarray(a), jnp.asarray(a)))
    close = float(sliced_wasserstein2(jnp.asarray(a), jnp.asarray(b)))
    far = float(sliced_wasserstein2(jnp.asarray(a), jnp.asarray(shifted)))
    assert same == pytest.approx(0.0, abs=1e-5)
    assert far > close
    # mean shift of 2 per coordinate → W2 ≈ 2 along the mean direction,
    # sliced averages over directions so it's bounded by 2
    assert 0.1 < far <= 2.5


def test_energy_distance_properties(sets):
    a, b, shifted = sets
    close = float(energy_distance(jnp.asarray(a), jnp.asarray(b)))
    far = float(energy_distance(jnp.asarray(a), jnp.asarray(shifted)))
    assert abs(close) < 0.5
    assert far > close + 0.5


def test_chunked_knn_matches_exact(sets):
    from wordgesture_gan_tpu.ops.stats import knn_precision_recall

    a, b, _ = sets
    p_exact, r_exact, _, _ = knn_precision_recall(jnp.asarray(a), jnp.asarray(b), 3)
    p_chunk, r_chunk = chunked_knn_precision_recall(a, b, k=3, row_chunk=128)
    assert p_chunk == pytest.approx(float(p_exact), abs=1e-6)
    assert r_chunk == pytest.approx(float(r_exact), abs=1e-6)


def test_evaluate_large_scale_smoke():
    rng = np.random.default_rng(1)
    real = rng.uniform(-1, 1, (300, 128, 3)).astype(np.float32)
    fake = rng.uniform(-1, 1, (300, 128, 3)).astype(np.float32)
    res = evaluate_large_scale(real, fake, n_projections=32)
    for key in ("sliced_w2", "energy_distance", "precision", "recall",
                "sinkhorn_matched_cost", "sinkhorn_matched_cost_std"):
        assert np.isfinite(res[key]), key
    assert res["n_samples"] == 300


def test_sinkhorn_matched_cost_vs_hungarian():
    """The on-device Sinkhorn estimator must approach the exact Hungarian
    matched mean distance (the reference's Wasserstein scalar) from above."""
    from wordgesture_gan_tpu.metrics.large_scale import sinkhorn_matched_cost_subsampled
    from wordgesture_gan_tpu.ops.assignment import matched_mean_distance
    from wordgesture_gan_tpu.ops.stats import pairwise_l2

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.normal(0, 1, (256, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(0.5, 1, (256, 32)), jnp.float32)

    exact = matched_mean_distance(np.asarray(pairwise_l2(a, b)))
    approx = sinkhorn_matched_cost_subsampled(a, b, n_sub=256, epsilon=0.01)
    assert approx >= exact - 1e-3           # entropic cost upper-bounds
    assert approx == pytest.approx(exact, rel=0.05)


def test_sinkhorn_repeated_subsample_bias():
    """Bias validation (VERDICT item 6, scaled to CI runtime: population
    2048, subsample 512 — same ratio regime as 100k/4096). The raw
    subsample mean overestimates the full-population Hungarian scalar (a
    smaller matching has fewer candidates); the log2-extrapolated
    production estimate must land within ~2% of exact."""
    from wordgesture_gan_tpu.metrics.large_scale import (
        sinkhorn_matched_cost_extrapolated,
        sinkhorn_matched_cost_repeated,
    )
    from wordgesture_gan_tpu.ops.assignment import matched_mean_distance
    from wordgesture_gan_tpu.ops.stats import pairwise_l2

    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.normal(0, 1, (2048, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(0.4, 1.1, (2048, 16)), jnp.float32)

    exact = matched_mean_distance(np.asarray(pairwise_l2(a, b)))
    mean, std, values = sinkhorn_matched_cost_repeated(
        a, b, n_sub=512, epsilon=0.01, key=jax.random.PRNGKey(0), n_repeats=4
    )
    assert len(values) == 4 and 0.0 <= std < 0.05 * mean
    assert mean > exact                            # raw subsample bias is positive
    assert mean < exact * 1.15                     # ...and bounded

    est = sinkhorn_matched_cost_extrapolated(
        a, b, n_sub=512, epsilon=0.01, key=jax.random.PRNGKey(0), n_repeats=6
    )
    assert est["slope"] > 0                        # cost falls as n grows
    # Raw bias is +8%; the corrected estimate must land within 4%.
    assert est["estimate"] == pytest.approx(exact, rel=0.04)
