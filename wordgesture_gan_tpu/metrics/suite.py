"""The full evaluation metric suite — the framework's equivalent of the
reference's ``evaluate_all_metrics`` (/root/reference/src/gan/evaluation.py:297-500),
with every heavy kernel batched on device:

  * L2 Wasserstein: cdist on the MXU + host Hungarian assignment;
  * DTW Wasserstein: exact batched wavefront DTW (vs the reference's
    process-parallel approximate fastdtw), same √L normalization;
  * savgol jerk: one precomputed (L, L) linear map per batch;
  * time-aware velocity/acceleration/speed/time-delta correlations: fused;
  * FID: on-device-trained AE features + eigh-based Fréchet distance;
  * k-NN precision/recall: device matmuls.

Real-side computations are returned under ``_cached_real`` for reuse by a
second model evaluation (GAN then min-jerk), mirroring the reference's
caching contract (evaluation.py:329-333,490-498).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..configs import (
    DEFAULT_EVALUATION_CONFIG,
    DEFAULT_MODEL_CONFIG,
    EvaluationConfig,
    ModelConfig,
)
from ..ops.assignment import matched_mean_distance
from ..ops.dtw import dtw_distance_matrix
from ..ops.savgol import batched_savgol_jerk
from ..ops.stats import (
    acceleration_correlation,
    knn_precision_recall,
    pairwise_l2,
    speed_profile_correlation,
    time_delta_correlation,
    velocity_correlation,
)
from .fid import encode_features, fid_from_features, load_or_train_fid_autoencoder


def _make_ae_test_loss():
    import jax

    from ..models.gan import autoencoder_apply

    # Module-level jit: a fresh jit(lambda) per eval call would recompile
    # every invocation.
    return jax.jit(lambda p, x: jnp.abs(autoencoder_apply(p, x) - x).mean())


_ae_test_loss = _make_ae_test_loss()


def evaluate_all_metrics(
    real_gestures: np.ndarray,
    fake_gestures: np.ndarray,
    train_gestures: Optional[np.ndarray] = None,
    model_config: ModelConfig = DEFAULT_MODEL_CONFIG,
    eval_config: EvaluationConfig = DEFAULT_EVALUATION_CONFIG,
    skip_dtw: bool = False,
    cached_real: Optional[Dict] = None,
    cache_dir: Optional[str] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    """Run the paper's metric suite on (n, L, 3) real/fake gesture arrays.

    Returns a dict of scalars plus ``_cached_real`` holding the reusable
    real-side intermediates (flattened xy, self-distances, radii, trained
    FID AE params + features).
    """
    # Matched sample counts (the reference always evaluates equal-size sets;
    # reshaping the fake set with the real count would silently scramble
    # rows). L comes from the ARRAYS, not the model config — callers may
    # evaluate at a different resampling length.
    n = min(len(real_gestures), len(fake_gestures))
    if len(real_gestures) != len(fake_gestures):
        real_gestures = real_gestures[:n]
        fake_gestures = fake_gestures[:n]
    L = real_gestures.shape[1]
    results: Dict[str, float] = {}

    real_d = jnp.asarray(real_gestures, jnp.float32)
    fake_d = jnp.asarray(fake_gestures, jnp.float32)

    if cached_real:
        real_flat_xy = cached_real["real_flat_xy"]
    else:
        real_flat_xy = real_d[:, :, :2].reshape(n, -1)
    fake_flat_xy = fake_d[:, :, :2].reshape(n, -1)

    # --- L2 Wasserstein: device cdist, host Hungarian (evaluation.py:336-339)
    cross_xy = pairwise_l2(real_flat_xy, fake_flat_xy)
    results["l2_wasserstein"] = matched_mean_distance(np.asarray(cross_xy))

    # --- DTW Wasserstein (evaluation.py:342-361)
    if skip_dtw:
        results["dtw_wasserstein"] = -1.0
    else:
        dtw_mat = dtw_distance_matrix(real_gestures[:, :, :2], fake_gestures[:, :, :2])
        results["dtw_wasserstein"] = matched_mean_distance(dtw_mat) / np.sqrt(L)

    # --- savgol jerk (evaluation.py:363-373)
    if L >= eval_config.savgol_window:
        results["jerk_real"] = float(
            batched_savgol_jerk(real_d, eval_config.savgol_window, eval_config.savgol_poly_order).mean()
        )
        results["jerk_fake"] = float(
            batched_savgol_jerk(fake_d, eval_config.savgol_window, eval_config.savgol_poly_order).mean()
        )
    else:
        results["jerk_real"] = results["jerk_fake"] = 0.0

    # --- time-aware dynamics correlations (evaluation.py:375-391)
    results["velocity_corr"] = float(velocity_correlation(real_d, fake_d))
    results["acceleration_corr"] = float(acceleration_correlation(real_d, fake_d))
    results["speed_profile_corr"] = float(speed_profile_correlation(real_d, fake_d))
    results["time_delta_corr"] = float(time_delta_correlation(real_d, fake_d))

    # --- FID (evaluation.py:393-468)
    if cached_real and "ae_params" in cached_real:
        ae_params = cached_real["ae_params"]
        real_features = cached_real["real_features"]
        final_loss = cached_real["ae_loss"]
    else:
        train_data = train_gestures if train_gestures is not None else real_gestures
        ae_params, final_loss = load_or_train_fid_autoencoder(
            np.asarray(train_data, np.float32), model_config, eval_config,
            cache_dir=cache_dir, verbose=verbose,
        )
        real_features = encode_features(ae_params, real_gestures)
    results["ae_reconstruction_loss"] = final_loss

    fake_features = encode_features(ae_params, fake_gestures)
    import jax

    results["ae_test_loss"] = float(_ae_test_loss(jax.device_put(ae_params), real_d))
    results["fid"] = fid_from_features(real_features, fake_features)
    # Feature-space provenance travels with the number: 'positional' FIDs are
    # NOT comparable to the reference/paper's ('paper'-mode) values, so every
    # reporting site labels the FID with this (ADVICE r3).
    mode = getattr(eval_config, "fid_feature_mode", "paper")
    results["fid_feature_mode"] = mode

    # FID in BOTH feature spaces: the configured mode above plus the other
    # one, so defaults-run tables can show the paper-space number next to the
    # paper column (and the shape-aware positional number next to it) without
    # a second eval invocation. The second AE is one cached train
    # (load_or_train_fid_autoencoder keys the cache on the full
    # hyperparameter set, fid_feature_mode included).
    import dataclasses as _dc

    other_mode = "paper" if mode == "positional" else "positional"
    if cached_real and "ae_params_alt" in cached_real:
        ae_params_alt = cached_real["ae_params_alt"]
        real_features_alt = cached_real["real_features_alt"]
    else:
        train_data = train_gestures if train_gestures is not None else real_gestures
        ae_params_alt, _ = load_or_train_fid_autoencoder(
            np.asarray(train_data, np.float32), model_config,
            _dc.replace(eval_config, fid_feature_mode=other_mode),
            cache_dir=cache_dir, verbose=verbose,
        )
        real_features_alt = encode_features(ae_params_alt, real_gestures)
    fake_features_alt = encode_features(ae_params_alt, fake_gestures)
    results[f"fid_{mode}"] = results["fid"]
    results[f"fid_{other_mode}"] = fid_from_features(real_features_alt, fake_features_alt)

    # --- k-NN precision / recall (evaluation.py:470-488)
    precision, recall, real_dists, real_radii = knn_precision_recall(
        real_flat_xy, fake_flat_xy, eval_config.precision_recall_k,
        real_dists=cached_real.get("real_dists") if cached_real else None,
        real_radii=cached_real.get("real_radii") if cached_real else None,
        cross=cross_xy,
    )
    results["precision"] = float(precision)
    results["recall"] = float(recall)

    results["_cached_real"] = {
        "real_flat_xy": real_flat_xy,
        "real_dists": real_dists,
        "real_radii": real_radii,
        "ae_params": ae_params,
        "real_features": real_features,
        "ae_loss": final_loss,
        "ae_params_alt": ae_params_alt,
        "real_features_alt": real_features_alt,
    }
    return results
