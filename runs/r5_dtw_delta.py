"""Quantify the exact-DTW ↔ reference-fastdtw delta at eval scale (VERDICT r4 #2).

The reference's DTW-Wasserstein runs approximate fastdtw (radius=1,
euclidean) over every real×fake pair and Hungarian-matches the matrix
(/root/reference/src/gan/evaluation.py:342-361). This framework's metric is
the EXACT batched device DTW (ops/dtw.py). Since fastdtw only ever searches
a subset of warp paths, F(i,j) ≥ E(i,j) elementwise, so

    exact-W  =  min_A mean E(A)  ≤  min_A mean F(A)  =  fastdtw-W
    fastdtw-W ≤ mean F(A*_E)   (the exact-optimal assignment is feasible)

i.e. the reference's number lives in the measured band
[exact-W, mean-fastdtw-over-exact-assignment]. The full 2000×2000 fastdtw
matrix is ~31 core-hours on this host's single core (the reference fans it
over a many-core cloud box), but the band needs only the n matched pairs —
and its width IS the quantity of interest: the per-pair fastdtw overshoot
on the distribution the metric actually matches.

Usage (after the r5 sweep has produced runs/r5_base):
    python runs/r5_dtw_delta.py --checkpoint-dir runs/r5_base --n 2000

Prints a human summary plus one JSON line (saved to runs/r5_dtw_delta.json).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from wordgesture_gan_tpu.cli_common import add_data_args, load_split
from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
from wordgesture_gan_tpu.utils.logging import log, seed_everything


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint-dir", type=str, default="runs/r5_base")
    parser.add_argument("--n", type=int, default=2000)
    parser.add_argument("--out", type=str, default="runs/r5_dtw_delta.json")
    add_data_args(parser)
    args = parser.parse_args()
    seed_everything(args.seed)

    from wordgesture_gan_tpu.ops.assignment import hungarian_matching
    from wordgesture_gan_tpu.ops.dtw import dtw_distance_matrix
    from wordgesture_gan_tpu.ops.fastdtw_approx import fastdtw
    from wordgesture_gan_tpu.train.checkpoint import load_run_metadata, restore_checkpoint
    from wordgesture_gan_tpu.train.gan_loop import generate_gestures
    from wordgesture_gan_tpu.train.state import init_gan_state

    meta = load_run_metadata(args.checkpoint_dir)
    model_config = ModelConfig(
        generator_type=meta.get("generator_type", "bilstm"),
        time_head=meta.get("time_head", "tanh"),
        gen_hidden_dim=meta.get("gen_hidden_dim", 48))
    training_config = TrainingConfig()

    train_ds, test_ds, _ = load_split(args, model_config, training_config)
    n = min(args.n, len(test_ds))
    real = np.asarray(test_ds.gestures[:n], np.float32)

    state = restore_checkpoint(
        init_gan_state(args.seed, model_config, training_config), args.checkpoint_dir)
    assert state is not None, f"no checkpoint in {args.checkpoint_dir}"
    fake = generate_gestures(state, test_ds.prototypes[:n], model_config,
                             seed=args.seed)
    log(f"Loaded {n} real test gestures + generated {n} GAN samples "
        f"(epoch {int(np.asarray(state['epoch']))})")

    # Exact DTW matrix on device + Hungarian on host — the production metric.
    t0 = time.time()
    E = np.asarray(dtw_distance_matrix(real[:, :, :2], fake[:, :, :2]), np.float64)
    rows, cols = hungarian_matching(E)
    L = real.shape[1]
    exact_w = float(E[rows, cols].mean() / np.sqrt(L))
    log(f"Exact DTW matrix {E.shape} + Hungarian in {time.time() - t0:.1f}s; "
        f"exact DTW-W = {exact_w:.4f}")

    # fastdtw (reference semantics: radius=1, euclidean) on the n matched
    # pairs — the feasible-assignment upper bound for fastdtw-W.
    from scipy.spatial.distance import euclidean

    t0 = time.time()
    F_matched = np.empty(n, np.float64)
    for k, (i, j) in enumerate(zip(rows, cols)):
        F_matched[k], _ = fastdtw(real[i, :, :2].astype(np.float64),
                                  fake[j, :, :2].astype(np.float64),
                                  dist=euclidean)
        if (k + 1) % 500 == 0:
            log(f"  fastdtw {k + 1}/{n} pairs ({time.time() - t0:.0f}s)")
    upper_w = float(F_matched.mean() / np.sqrt(L))

    E_matched = E[rows, cols]
    overshoot = (F_matched - E_matched) / np.maximum(E_matched, 1e-12)
    # The inequality F >= E holds in exact arithmetic, but E is accumulated in
    # fp32 on device (128+ additions), so allow a relative fp32-noise band.
    viol = np.maximum(E_matched - F_matched, 0.0) / np.maximum(E_matched, 1e-12)
    assert viol.max() < 1e-4, (
        f"fastdtw must upper-bound exact DTW beyond fp32 noise "
        f"(max relative violation {viol.max():.2e})")
    if viol.max() > 0:
        log(f"  fp32-noise violations: {int((viol > 0).sum())}/{n} pairs, "
            f"max relative {viol.max():.2e} (within tolerance)")

    band_pct = 100.0 * (upper_w - exact_w) / exact_w
    record = {
        "n": n,
        "exact_dtw_wasserstein": round(exact_w, 6),
        "fastdtw_wasserstein_upper_bound": round(upper_w, 6),
        "band_width_pct": round(band_pct, 4),
        "per_pair_overshoot_pct": {
            "mean": round(float(overshoot.mean() * 100), 4),
            "p50": round(float(np.percentile(overshoot, 50) * 100), 4),
            "p95": round(float(np.percentile(overshoot, 95) * 100), 4),
            "max": round(float(overshoot.max() * 100), 4),
        },
        "checkpoint_dir": args.checkpoint_dir,
    }
    log("")
    log(f"exact DTW-W = {exact_w:.4f} ≤ reference fastdtw-W ≤ {upper_w:.4f} "
        f"(band width {band_pct:.2f}%)")
    log(f"per-pair fastdtw overshoot: mean {record['per_pair_overshoot_pct']['mean']:.2f}%, "
        f"p95 {record['per_pair_overshoot_pct']['p95']:.2f}%, "
        f"max {record['per_pair_overshoot_pct']['max']:.2f}%")
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
