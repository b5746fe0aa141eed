#!/usr/bin/env python
"""Evaluate WordGesture-GAN and/or the fitted minimum-jerk baseline.

CLI-parity entry point with the reference (/root/reference/eval_gan.py:320-351):
``--model gan|min-jerk|both``, ``--n-samples``, ``--truncation``,
``--savgol-window``, ``--precision-k``, ``--wandb``, ``--fast`` (skip DTW).

Usage:
    python eval_gan.py --model both --n-samples 2000 [--synthetic]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

from wordgesture_gan_tpu.cli_common import add_data_args, load_split, maybe_wandb
from wordgesture_gan_tpu.configs import (
    EvaluationConfig,
    ModelConfig,
    PathsConfig,
    TrainingConfig,
)
from wordgesture_gan_tpu.utils.logging import log, seed_everything


def main() -> None:
    parser = argparse.ArgumentParser(description="Evaluate WordGesture-GAN (TPU)")
    parser.add_argument("--model", choices=["gan", "min-jerk", "both"], default="both")
    parser.add_argument("--n-samples", type=int, default=2000)
    parser.add_argument("--truncation", type=float, default=1.0)
    parser.add_argument("--savgol-window", type=int, default=21)
    parser.add_argument("--precision-k", type=int, default=3)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--fast", action="store_true", help="skip DTW Wasserstein")
    parser.add_argument("--fid-features", choices=["positional", "paper"],
                        default="positional",
                        help="FID feature AE decoder: 'positional' (shape-aware "
                             "features; default) or 'paper' (reference parity — "
                             "constant-trace decoder, features near-blind to "
                             "shape/timing)")
    parser.add_argument("--large-scale", type=int, default=0, metavar="N",
                        help="distribution metrics at scale: generate N gestures "
                             "(e.g. 100000) and evaluate with sliced-W2 / energy "
                             "distance / chunked kNN instead of Hungarian matching")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--generator", choices=["bilstm", "mlp", "transformer"],
                        default=None, help="generator family (default: what the "
                        "checkpoint's run metadata records, else bilstm)")
    parser.add_argument("--time-head", choices=["tanh", "monotone"], default=None,
                        help="generator time-channel head (default: what the "
                             "checkpoint's run metadata records, else tanh)")
    parser.add_argument("--gen-hidden", type=int, default=None,
                        help="BiLSTM hidden dim (default: run metadata, else 48)")
    parser.add_argument("--precision", choices=["float32", "bfloat16"],
                        default="float32",
                        help="generation compute precision (metrics always fp32; "
                             "bfloat16 speeds the 100k-scale generation)")
    parser.add_argument("--variable-length", action="store_true",
                        help="evaluate a --variable-length checkpoint: masked "
                             "generation at natural resolution, metrics on the "
                             "common 128-point arc-length grid")
    parser.add_argument("--arc-step", type=float, default=0.02,
                        help="arc-length per point for --variable-length")
    parser.add_argument("--save-figures", type=str, default=None,
                        help="directory for comparison/overlay figures")
    add_data_args(parser)
    args = parser.parse_args()

    from wordgesture_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    log(f"Devices: {jax.devices()}")
    log(f"Model: {args.model}, Samples: {args.n_samples}, Truncation: {args.truncation}")
    log(f"Savgol window: {args.savgol_window}, Precision k: {args.precision_k}, Fast: {args.fast}")
    log("")
    seed_everything(args.seed)

    # Architecture knobs default to what the training run recorded in its
    # run-metadata sidecar, so `eval_gan.py --checkpoint-dir D` restores any
    # generator family/head without re-specifying flags.
    from wordgesture_gan_tpu.train.checkpoint import load_run_metadata

    meta = load_run_metadata(args.checkpoint_dir)
    model_config = ModelConfig(
        generator_type=args.generator or meta.get("generator_type", "bilstm"),
        time_head=args.time_head or meta.get("time_head", "tanh"),
        gen_hidden_dim=args.gen_hidden or meta.get("gen_hidden_dim", 48),
        compute_dtype=args.precision)
    training_config = TrainingConfig()
    eval_config = EvaluationConfig(
        n_samples=args.n_samples,
        truncation=args.truncation,
        savgol_window=args.savgol_window,
        precision_recall_k=args.precision_k,
        fid_feature_mode=args.fid_features,
    )

    if args.variable_length:
        ignored = [name for name, hit in (
            ("--wandb", args.wandb),
            ("--save-figures", bool(args.save_figures)),
            ("--model min-jerk", args.model == "min-jerk"),
            ("--large-scale", bool(args.large_scale)),
        ) if hit]
        if ignored:
            log(f"NOTE: --variable-length evaluates the masked transformer "
                f"path only; ignoring {', '.join(ignored)}")
        _run_variable_length(args, model_config, training_config, eval_config)
        return

    log("[1/5] Loading data...")
    train_ds, test_ds, keyboard = load_split(args, model_config, training_config)
    log(f"  Train: {len(train_ds)}, Test: {len(test_ds)}")

    n = min(args.n_samples, len(test_ds))
    real_g = test_ds.gestures[:n]
    words = test_ds.words[:n]

    if args.large_scale:
        _run_large_scale(args, train_ds, test_ds, model_config, training_config, eval_config)
        return

    gan_fake = None
    if args.model in ("gan", "both"):
        log("[2/5] Loading GAN checkpoint...")
        from wordgesture_gan_tpu.train.checkpoint import restore_checkpoint
        from wordgesture_gan_tpu.train.gan_loop import generate_gestures
        from wordgesture_gan_tpu.train.state import init_gan_state

        template = init_gan_state(args.seed, model_config, training_config)
        state = restore_checkpoint(template, args.checkpoint_dir)
        if state is None:
            log(f"  ERROR: No checkpoint found in {args.checkpoint_dir}")
            if args.model == "gan":
                sys.exit(1)
            log("  Skipping GAN evaluation.")
        else:
            epoch = int(np.asarray(state["epoch"]))
            log(f"  Loaded checkpoint from epoch {epoch}")
            log("[3/5] Generating samples (batched)...")
            gan_fake = generate_gestures(
                state, test_ds.prototypes[:n], model_config,
                truncation=args.truncation, seed=args.seed,
            )
            log(f"    Generated {n} samples")

    log("[4/5] Computing metrics...")
    from wordgesture_gan_tpu.eval.gan_eval import (
        PAPER_GAN,
        PAPER_MINJERK,
        evaluate_gan_and_minjerk,
        print_comparison_table,
        print_results_table,
    )

    gan_results, minjerk_results = evaluate_gan_and_minjerk(
        real_g, words, train_ds, keyboard,
        gan_fake=gan_fake,
        run_minjerk=args.model in ("min-jerk", "both"),
        model_config=model_config,
        eval_config=eval_config,
        skip_dtw=args.fast,
        cache_dir=args.checkpoint_dir,
    )
    log("[5/5] Done computing metrics.")
    log("")

    if args.model == "both" and gan_results and minjerk_results:
        print_comparison_table(gan_results, minjerk_results, args.precision_k)
    elif gan_results:
        print_results_table(gan_results, "GAN", PAPER_GAN, args.precision_k)
    elif minjerk_results:
        print_results_table(minjerk_results, "Minimum Jerk", PAPER_MINJERK, args.precision_k)

    if args.save_figures and gan_fake is not None:
        from wordgesture_gan_tpu.viz import create_comparison_figure, create_overlay_figure
        import matplotlib.pyplot as plt

        out = Path(args.save_figures)
        out.mkdir(parents=True, exist_ok=True)
        fig = create_comparison_figure(real_g[:6], gan_fake[:6], words[:6])
        fig.savefig(out / "comparison.png", dpi=100)
        plt.close(fig)
        fig = create_overlay_figure(real_g[:5], gan_fake[:5], words[0] if words else "sample")
        fig.savefig(out / "overlay.png", dpi=100)
        plt.close(fig)
        log(f"Figures saved to {out}")

    if args.wandb:
        # Attach eval results to the training run via the run-id sidecar
        # (reference eval_gan.py:145-147 resumes the training run the same
        # way); falls back to a standalone run when no sidecar exists.
        from wordgesture_gan_tpu.train.checkpoint import load_run_metadata

        train_run_id = load_run_metadata(args.checkpoint_dir).get("wandb_run_id")
        wb = maybe_wandb(True, project=PathsConfig().wandb_project,
                         name=None if train_run_id else "eval_standalone",
                         id=train_run_id, resume="allow" if train_run_id else None)
        if wb is not None:
            # GAN scalars + comparison/overlay figures into the resumed run
            # (reference eval_gan.py:160-184) plus the min-jerk table the
            # reference computes but never logs.
            from wordgesture_gan_tpu.eval.gan_eval import attach_eval_to_wandb

            attach_eval_to_wandb(wb, gan_results, minjerk_results,
                                 real_g=real_g, gan_fake=gan_fake, words=words)
            wb.finish()

    log("")
    log("Done.")


def _run_variable_length(args, model_config, training_config, eval_config):
    """Evaluate a --variable-length (masked transformer) checkpoint.

    Real and generated traces both live at natural resolution; for metric
    comparability each valid segment is resampled onto the common 128-point
    arc-length grid with the on-device kernel (ops/resample.py), then the
    standard suite runs. The time channel rides the interpolation, as in the
    parity pipeline."""
    import dataclasses

    import numpy as np

    from wordgesture_gan_tpu.cli_common import resolve_dataset_zip
    from wordgesture_gan_tpu.data.variable_length import (
        create_variable_split,
        load_variable_dataset_from_zip,
    )
    from wordgesture_gan_tpu.eval.gan_eval import PAPER_GAN, print_results_table
    from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
    from wordgesture_gan_tpu.metrics.suite import evaluate_all_metrics
    from wordgesture_gan_tpu.ops.resample import batched_arclength_resample
    from wordgesture_gan_tpu.train.checkpoint import restore_checkpoint
    from wordgesture_gan_tpu.train.state import init_gan_state
    from wordgesture_gan_tpu.train.variable_loop import generate_variable_gestures

    model_config = dataclasses.replace(model_config, generator_type="transformer")
    keyboard = QWERTYKeyboard()
    zip_path = resolve_dataset_zip(args)
    log("[1/5] Loading variable-length data...")
    by_word, _ = load_variable_dataset_from_zip(
        zip_path, keyboard, max_len=model_config.seq_length, arc_step=args.arc_step,
        max_samples_per_word=training_config.max_samples_per_word,
        max_files=args.max_files, seed=args.seed,
    )
    train_ds, test_ds = create_variable_split(
        by_word, keyboard, max_len=model_config.seq_length,
        train_ratio=training_config.train_ratio, seed=args.seed,
    )

    log("[2/5] Loading variable-length GAN checkpoint...")
    template = init_gan_state(args.seed, model_config, training_config)
    state = restore_checkpoint(template, args.checkpoint_dir)
    if state is None:
        log(f"  ERROR: No checkpoint found in {args.checkpoint_dir}")
        sys.exit(1)
    log(f"  Loaded checkpoint from epoch {int(np.asarray(state['epoch']))}")

    n = min(args.n_samples, len(test_ds))
    log(f"[3/5] Generating {n} masked samples...")
    fake = generate_variable_gestures(
        state, test_ds.prototypes[:n], test_ds.masks()[:n], model_config,
        truncation=args.truncation, seed=args.seed,
    )

    log("[4/5] Resampling to the common 128-point grid + computing metrics...")
    import jax.numpy as jnp

    lengths = jnp.asarray(test_ds.lengths[:n])
    real128 = np.asarray(batched_arclength_resample(
        jnp.asarray(test_ds.gestures[:n]), lengths, 128))
    fake128 = np.asarray(batched_arclength_resample(
        jnp.asarray(fake), lengths, 128))
    tr_lengths = jnp.asarray(train_ds.lengths)
    train128 = np.asarray(batched_arclength_resample(
        jnp.asarray(train_ds.gestures), tr_lengths, 128))

    results = evaluate_all_metrics(
        real128, fake128, train128,
        model_config=dataclasses.replace(model_config, seq_length=128),
        eval_config=eval_config, skip_dtw=args.fast, cache_dir=args.checkpoint_dir,
    )
    log("[5/5] Done computing metrics.")
    log("")
    log(f"Variable-length traces: test lengths {test_ds.lengths[:n].min()}-"
        f"{test_ds.lengths[:n].max()} (mean {test_ds.lengths[:n].mean():.1f}); "
        f"metrics on the common 128-point grid:")
    print_results_table(results, "GAN (variable-length)", PAPER_GAN, args.precision_k)


def _run_large_scale(args, train_ds, test_ds, model_config, training_config, eval_config):
    """100k-scale evaluation (BASELINE config 4): sample N gestures over
    test prototypes drawn with replacement, compare against the real test
    distribution (resampled to N) with scale-friendly estimators."""
    import jax
    import numpy as np

    from wordgesture_gan_tpu.metrics.fid import load_or_train_fid_autoencoder
    from wordgesture_gan_tpu.metrics.large_scale import evaluate_large_scale
    from wordgesture_gan_tpu.train.checkpoint import restore_checkpoint
    from wordgesture_gan_tpu.train.gan_loop import generate_gestures
    from wordgesture_gan_tpu.train.state import init_gan_state

    n = args.large_scale
    log(f"[large-scale] Evaluating with N={n}")

    template = init_gan_state(args.seed, model_config, training_config)
    state = restore_checkpoint(template, args.checkpoint_dir)
    if state is None:
        log(f"ERROR: No checkpoint found in {args.checkpoint_dir}")
        sys.exit(1)

    rng = np.random.default_rng(args.seed)
    proto_idx = rng.integers(0, len(test_ds), n)
    real_idx = rng.integers(0, len(test_ds), n)

    log(f"[large-scale] Generating {n} gestures (batched)...")
    import time as _t

    t0 = _t.perf_counter()
    fake = generate_gestures(state, test_ds.prototypes[proto_idx], model_config,
                             truncation=args.truncation, seed=args.seed)
    dt = _t.perf_counter() - t0
    log(f"[large-scale] Generated {n} gestures in {dt:.1f}s "
        f"({n / dt / 1e3:.1f}k gestures/s → {60 * n / dt / 1e6:.2f}M/min)")

    real = test_ds.gestures[real_idx]
    ae_params, _ = load_or_train_fid_autoencoder(
        train_ds.gestures, model_config, eval_config, cache_dir=args.checkpoint_dir
    )

    results = evaluate_large_scale(real, fake, ae_params=ae_params, seed=args.seed)
    log("")
    log("=" * 60)
    log(f"Large-scale distribution metrics (N={n})")
    log("=" * 60)
    for key, val in results.items():
        log(f"  {key:<20} {val:.5f}")
    log("=" * 60)


if __name__ == "__main__":
    main()
