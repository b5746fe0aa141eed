"""Measure the corpus CEILING for the pairwise timing-correlation metrics
(VERDICT r4 weak #2: "corpus mismatch may bound [time-delta corr]; no
analysis says so" — this is the analysis).

The eval metric (ops/stats.time_delta_correlation, mirroring reference
evaluation.py:264-294) Pearson-correlates real[i]'s Δt pattern against
fake[i]'s, where fake[i] is generated for the SAME WORD but with a random
latent — i.e. a random other plausible rendition of that word. Decompose a
real Δt pattern as word-determined signal + user noise with signal fraction
R² of the variance: two independent real renditions then correlate at R²
(both carry noise), while a generator that emits the PURE word-conditional
mean correlates at R = sqrt(real-real). So the measurement below yields TWO
numbers: the real-vs-real mean (what a generator that mimics user noise
scores in expectation) and its square root (the hard ceiling for any
generator). We measure on the same preprocessed test split the evals use:
for every test word with ≥2 gestures, correlate the Δt (and speed) profiles
of disjoint same-word pairs.

Usage:
    python runs/r5_dt_ceiling.py --synthetic --synthetic-users 1338

Prints a human summary plus one JSON line (saved to runs/r5_dt_ceiling.json).
"""

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from wordgesture_gan_tpu.cli_common import add_data_args, load_split
from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
from wordgesture_gan_tpu.utils.logging import seed_everything


def _pearson_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    am = a - a.mean(axis=1, keepdims=True)
    bm = b - b.mean(axis=1, keepdims=True)
    num = (am * bm).sum(axis=1)
    den = np.sqrt((am * am).sum(axis=1) * (bm * bm).sum(axis=1)) + 1e-12
    return num / den


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", type=str, default="runs/r5_dt_ceiling.json")
    add_data_args(parser)
    args = parser.parse_args()
    seed_everything(args.seed)

    _, test_ds, _ = load_split(args, ModelConfig(), TrainingConfig())
    g = np.asarray(test_ds.gestures, np.float32)  # (n, L, 3)

    by_word = defaultdict(list)
    for i, w in enumerate(test_ds.words):
        by_word[w].append(i)

    # Disjoint same-word pairs: (g[0],g[1]), (g[2],g[3]), ... so no gesture
    # is reused and pairs are independent draws of "two users, same word".
    left, right = [], []
    rng = np.random.default_rng(args.seed)
    for w, idxs in by_word.items():
        idxs = rng.permutation(idxs)
        for k in range(0, len(idxs) - 1, 2):
            left.append(idxs[k])
            right.append(idxs[k + 1])
    a, b = g[np.array(left)], g[np.array(right)]
    print(f"{len(left)} disjoint same-word real pairs "
          f"from {len(by_word)} test words")

    # Δt pattern correlation (the time_delta_corr metric's ceiling).
    dta, dtb = np.diff(a[:, :, 2], axis=1), np.diff(b[:, :, 2], axis=1)
    valid = (dta.std(axis=1) > 1e-10) & (dtb.std(axis=1) > 1e-10)
    dt_corr = _pearson_rows(dta[valid], dtb[valid])

    # Speed-profile correlation ceiling, same protocol as the metric
    # (time-aware |v|, p99 clip) — uses the shared device op for parity.
    from wordgesture_gan_tpu.ops.stats import speed_profile_correlation
    sp_ceiling = float(speed_profile_correlation(a, b))

    summary = {
        "n_pairs": int(len(left)),
        "time_delta_corr_real_real": float(dt_corr.mean()),
        "time_delta_corr_real_real_se": float(dt_corr.std() / np.sqrt(len(dt_corr))),
        "time_delta_corr_generator_ceiling": float(np.sqrt(max(dt_corr.mean(), 0.0))),
        "speed_profile_corr_real_real": sp_ceiling,
        "speed_profile_corr_generator_ceiling": float(np.sqrt(max(sp_ceiling, 0.0))),
    }
    print(json.dumps(summary))
    Path(args.out).write_text(json.dumps(summary, indent=2) + "\n")


if __name__ == "__main__":
    main()
