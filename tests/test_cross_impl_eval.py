"""Cross-implementation parity: the composed metric suite vs the reference's
torch ``evaluate_all_metrics`` (/root/reference/src/gan/evaluation.py:297-500)
on IDENTICAL (real, fake, train) arrays.

Deterministic metrics (L2-Wasserstein, savgol jerk, the four time-aware
correlations, precision/recall) must agree to float tolerance. DTW carries a
documented delta (reference: approximate fastdtw; ours: exact DP — exact is
a lower bound, within ~15% after assignment). FID's feature space is a
trained AE, so the end-to-end values are compared as a band while the
Fréchet computation itself is compared exactly on identical features.
"""

from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from cross_impl_utils import (  # noqa: E402
    REF,
    SequentialParallel,
    add_reference_to_path,
    make_gesture_arrays,
    torch_state_dict_numpy,
)

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not REF.exists(), reason="reference checkout not available")]

N, L = 48, 32


@pytest.fixture(scope="module")
def arrays():
    return make_gesture_arrays(N, L, seed=7)


@pytest.fixture(scope="module")
def ref_results(arrays, tmp_path_factory):
    """Run the reference torch evaluation suite once, on CPU, with the
    fastdtw shim + in-process joblib and a tmp AE cache path."""
    add_reference_to_path()
    from wordgesture_gan_tpu.ops.fastdtw_approx import install_fastdtw_shim

    install_fastdtw_shim()
    import joblib

    import src.gan.evaluation as ref_eval
    from src.shared.config import EvaluationConfig as RefEvalConfig
    from src.shared.config import ModelConfig as RefModelConfig

    real, fake, train = arrays
    tmp = tmp_path_factory.mktemp("ae_cache")
    orig_cache, orig_parallel = ref_eval._get_ae_cache_path, joblib.Parallel
    ref_eval._get_ae_cache_path = lambda data, cfg: Path(tmp) / "ae.pt"
    joblib.Parallel = SequentialParallel
    torch.manual_seed(0)
    try:
        results = ref_eval.evaluate_all_metrics(
            real, fake, train_gestures=train,
            model_config=RefModelConfig(seq_length=L),
            eval_config=RefEvalConfig(),
            device="cpu",
        )
    finally:
        ref_eval._get_ae_cache_path = orig_cache
        joblib.Parallel = orig_parallel
    return results


@pytest.fixture(scope="module")
def our_results(arrays):
    from wordgesture_gan_tpu.configs import EvaluationConfig, ModelConfig
    from wordgesture_gan_tpu.metrics.suite import evaluate_all_metrics

    real, fake, train = arrays
    return evaluate_all_metrics(
        real, fake, train_gestures=train,
        model_config=ModelConfig(seq_length=L),
        # Parity harness: pin the reference's paper AE decoder so the two
        # independently trained feature spaces are the same architecture
        # (the framework default, "positional", is a deliberate divergence —
        # see configs.py).
        eval_config=EvaluationConfig(fid_feature_mode="paper"),
        verbose=False,
    )


def test_l2_wasserstein_matches(ref_results, our_results):
    np.testing.assert_allclose(
        our_results["l2_wasserstein"], ref_results["l2_wasserstein"], rtol=1e-4
    )


def test_dtw_exact_lower_bounds_reference_fastdtw(ref_results, our_results):
    """Exact DTW ≤ fastdtw per pair ⇒ our matched mean lower-bounds the
    reference's, and stays within the measured fastdtw overshoot band."""
    ours, theirs = our_results["dtw_wasserstein"], ref_results["dtw_wasserstein"]
    assert ours <= theirs + 1e-6
    assert theirs <= ours * 1.15, (ours, theirs)


def test_jerk_matches(ref_results, our_results):
    np.testing.assert_allclose(our_results["jerk_real"], ref_results["jerk_real"], rtol=2e-4)
    np.testing.assert_allclose(our_results["jerk_fake"], ref_results["jerk_fake"], rtol=2e-4)


@pytest.mark.parametrize(
    "key", ["velocity_corr", "acceleration_corr", "speed_profile_corr", "time_delta_corr"]
)
def test_dynamics_correlations_match(ref_results, our_results, key):
    np.testing.assert_allclose(our_results[key], ref_results[key], atol=5e-5)


def test_precision_recall_match(ref_results, our_results):
    """Same in/out decision for every sample: the fractions (multiples of
    1/N) must be identical; compare at float32 resolution."""
    assert our_results["precision"] == pytest.approx(ref_results["precision"], abs=1e-6)
    assert our_results["recall"] == pytest.approx(ref_results["recall"], abs=1e-6)


def test_fid_computation_identical_features(ref_results, arrays):
    """Our eigh-based Fréchet distance vs the reference's scipy-sqrtm FID on
    the SAME (torch-AE) features — isolates the FID arithmetic from the
    stochastic feature-space training."""
    from wordgesture_gan_tpu.metrics.fid import fid_from_features

    _, fake, _ = arrays
    cached = ref_results["_cached_real"]
    ae = cached["autoencoder"]
    ae.eval()
    with torch.no_grad():
        fake_features = ae.encode(torch.tensor(fake, dtype=torch.float32)).numpy()
    ours = fid_from_features(cached["real_features"], fake_features)
    np.testing.assert_allclose(ours, ref_results["fid"], rtol=1e-3, atol=1e-5)


def test_fid_same_band(ref_results, our_results):
    """End-to-end FID uses independently trained feature AEs (torch vs jax)
    so values differ stochastically; both must land in the same decade on
    the same inputs."""
    ours, theirs = our_results["fid"], ref_results["fid"]
    assert ours >= 0 and theirs >= 0
    if theirs > 1e-3 or ours > 1e-3:
        assert 0.1 < (ours + 1e-3) / (theirs + 1e-3) < 10.0, (ours, theirs)


def test_autoencoder_architecture_parity(ref_results, arrays):
    """The trained torch FID AE, converted weight-for-weight, reproduces
    encode/reconstruct outputs in our functional AE — the two feature
    extractors are the same architecture."""
    from wordgesture_gan_tpu.configs import ModelConfig
    from wordgesture_gan_tpu.interop import autoencoder_from_torch
    from wordgesture_gan_tpu.models.gan import autoencoder_apply, autoencoder_encode

    real, _, _ = arrays
    ae = ref_results["_cached_real"]["autoencoder"]
    params = autoencoder_from_torch(torch_state_dict_numpy(ae), ModelConfig(seq_length=L))

    ae.eval()
    with torch.no_grad():
        x = torch.tensor(real[:8], dtype=torch.float32)
        torch_enc = ae.encode(x).numpy()
        torch_rec = ae(x).numpy()
    np.testing.assert_allclose(
        np.asarray(autoencoder_encode(params, real[:8])), torch_enc, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(autoencoder_apply(params, real[:8])), torch_rec, atol=2e-5
    )
