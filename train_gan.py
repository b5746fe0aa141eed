#!/usr/bin/env python
"""Train WordGesture-GAN on TPU.

CLI-parity entry point with the reference (/root/reference/train_gan.py:229-240:
``--epochs``, ``--no-resume``; the ``--gpu`` Modal knob is replaced by local
mesh/runtime flags since training runs directly on the TPU host).

Usage:
    python train_gan.py [--epochs N] [--no-resume] [--batch-size B]
                        [--synthetic] [--wandb] [--profile-dir DIR]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from wordgesture_gan_tpu.cli_common import add_data_args, load_split, maybe_wandb
from wordgesture_gan_tpu.configs import (
    ModelConfig,
    PathsConfig,
    RuntimeConfig,
    TrainingConfig,
    asdict,
)
from wordgesture_gan_tpu.utils.logging import log, seed_everything
from wordgesture_gan_tpu.utils.profiling import trace_profile


def main() -> None:
    parser = argparse.ArgumentParser(description="Train WordGesture-GAN (TPU)")
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--no-resume", action="store_true", help="start fresh")
    parser.add_argument("--batch-size", type=int, default=512)
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--generator", choices=["bilstm", "mlp", "transformer"],
                        default="bilstm", help="generator family")
    parser.add_argument("--time-head", choices=["tanh", "monotone"],
                        default="monotone",
                        help="time-channel output head: 'monotone' (cumsum of "
                             "softmax increments — learnable clock warp, the "
                             "quality default) or 'tanh' (reference parity; "
                             "its velocity/accel correlations collapse to ~0 "
                             "— see ModelConfig.time_head)")
    parser.add_argument("--lambda-rec", type=float, default=None,
                        help="override reconstruction-loss weight (default 4.0)")
    parser.add_argument("--lambda-kld", type=float, default=None,
                        help="override KLD weight (default 0.02)")
    parser.add_argument("--lambda-dt", type=float, default=None,
                        help="weight of the cycle-2 time-increment-pattern L1 "
                             "(losses.time_delta_loss; default 0 = off)")
    parser.add_argument("--lambda-speed", type=float, default=None,
                        help="weight of the cycle-2 speed-profile correlation "
                             "loss (losses.speed_profile_loss; default 0 = off)")
    parser.add_argument("--lambda-dtc", type=float, default=None,
                        help="weight of the cycle-2 Δt-pattern Pearson loss "
                             "(losses.time_delta_corr_loss; default 0 = off)")
    parser.add_argument("--lambda-ms", type=float, default=None,
                        help="MSGAN mode-seeking weight on a second prior draw "
                             "(losses.mode_seeking_loss; default 0 = off)")
    parser.add_argument("--lambda-div", type=float, default=None,
                        help="hinged conditional-diversity weight "
                             "(losses.diversity_hinge_loss; default 0 = off)")
    parser.add_argument("--div-margin", type=float, default=None,
                        help="hinge margin for --lambda-div; default measures "
                             "the corpus's mean within-word L1 distance")
    parser.add_argument("--gen-hidden", type=int, default=None,
                        help="override BiLSTM generator hidden dim (default 48)")
    parser.add_argument("--wandb", action="store_true", help="log to wandb")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace into this dir")
    parser.add_argument("--data-axis-size", type=int, default=-1,
                        help="devices on the data mesh axis (-1 = all)")
    parser.add_argument("--precision", choices=["float32", "bfloat16"],
                        default="bfloat16",
                        help="compute precision (params/optimizer stay fp32)")
    parser.add_argument("--variable-length", action="store_true",
                        help="train on natural-resolution traces with validity "
                             "masks (transformer generator; BASELINE config 5)")
    parser.add_argument("--arc-step", type=float, default=0.02,
                        help="arc-length per point for --variable-length")
    add_data_args(parser)
    args = parser.parse_args()

    from wordgesture_gan_tpu.parallel import maybe_init_distributed

    maybe_init_distributed()   # no-op single-host; joins the pod runtime when configured
    from wordgesture_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    log(f"Devices: {jax.devices()}")
    seed_everything(args.seed)

    model_config = ModelConfig(
        generator_type="transformer" if args.variable_length else args.generator,
        compute_dtype=args.precision,
        # Variable-length traces use the masked monotone head: softmax mass
        # confined to valid increments, so the clock spans 0→1 over the
        # valid segment (apply_time_head pad_mask).
        time_head=args.time_head,
        **({"gen_hidden_dim": args.gen_hidden} if args.gen_hidden else {}))
    training_config = TrainingConfig(
        num_epochs=args.epochs, batch_size=args.batch_size,
        **{k: v for k, v in (("lambda_rec", args.lambda_rec),
                             ("lambda_kld", args.lambda_kld),
                             ("lambda_dt", args.lambda_dt),
                             ("lambda_speed", args.lambda_speed),
                             ("lambda_dtc", args.lambda_dtc),
                             ("lambda_ms", args.lambda_ms),
                             ("lambda_div", args.lambda_div),
                             ("div_margin", args.div_margin)) if v is not None})
    runtime_config = RuntimeConfig(data_axis_size=args.data_axis_size,
                                   precision=args.precision)

    if args.variable_length:
        _train_variable(args, model_config, training_config, runtime_config)
        return

    train_ds, test_ds, keyboard = load_split(args, model_config, training_config)
    log(f"Data: {len(train_ds)} train, {len(test_ds)} test")

    # W&B run continuity across resume: the run id is persisted next to the
    # checkpoints (reference keeps it inside the torch checkpoint,
    # train_gan.py:114,191).
    from wordgesture_gan_tpu.train.checkpoint import (
        latest_epoch,
        load_run_metadata,
        save_run_metadata,
    )

    # Only attach to a prior W&B run when there is an actual checkpoint to
    # resume from (reference gates the same way, train_gan.py:109-114) —
    # otherwise a fresh epoch-0 run would overwrite the old run's history.
    resuming = not args.no_resume and latest_epoch(args.checkpoint_dir) > 0
    prior_run_id = load_run_metadata(args.checkpoint_dir).get("wandb_run_id") if resuming else None
    wb = maybe_wandb(
        args.wandb,
        project=PathsConfig().wandb_project,
        name=f"{'temporal' if model_config.use_temporal_disc else 'mlp'}_"
             f"{'xy' if not model_config.prototype_has_time else 'xyt'}_"
             f"{training_config.lambda_rec}_{training_config.lambda_kld}",
        config={"model": asdict(model_config), "training": asdict(training_config),
                "num_epochs": args.epochs},
        resume="allow",
        id=prior_run_id,
    )
    if wb is not None:
        save_run_metadata(args.checkpoint_dir, wandb_run_id=wb.run.id)
    # Persist the architecture knobs eval must match to restore the
    # checkpoint (eval_gan.py defaults to these when flags are omitted).
    save_run_metadata(args.checkpoint_dir,
                      generator_type=model_config.generator_type,
                      time_head=model_config.time_head,
                      gen_hidden_dim=model_config.gen_hidden_dim)

    from wordgesture_gan_tpu.train.gan_loop import generate_gestures, train_gan

    def epoch_callback(epoch, state, losses):
        if wb is not None:
            wb.log({"epoch": epoch + 1, "learning_rate": losses.get("lr", 0),
                    **{f"loss/{k}": v for k, v in losses.items() if k != "lr"}},
                   step=epoch + 1)
        # Periodic comparison figures (reference train_gan.py:170-186).
        if (epoch + 1) % 10 == 0 and len(test_ds) > 0:
            from wordgesture_gan_tpu.viz import create_comparison_figure

            n_viz = min(6, len(test_ds))
            fake = generate_gestures(state, test_ds.prototypes[:n_viz], model_config,
                                     seed=epoch)
            fig = create_comparison_figure(
                test_ds.gestures[:n_viz], fake, test_ds.words[:n_viz]
            )
            out = Path(args.checkpoint_dir) / f"samples_epoch_{epoch + 1}.png"
            out.parent.mkdir(parents=True, exist_ok=True)
            fig.savefig(out, dpi=100)
            if wb is not None:
                wb.log({"gestures/training_samples": wb.Image(fig)}, step=epoch + 1)
            import matplotlib.pyplot as plt

            plt.close(fig)

    with trace_profile(args.profile_dir):
        result = train_gan(
            train_ds,
            model_config=model_config,
            training_config=training_config,
            runtime_config=runtime_config,
            num_epochs=args.epochs,
            seed=args.seed,
            checkpoint_dir=args.checkpoint_dir,
            resume=not args.no_resume,
            epoch_callback=epoch_callback,
        )

    if wb is not None:
        wb.finish()
    log("Training complete!")


def _train_variable(args, model_config, training_config, runtime_config) -> None:
    """Variable-length training path (--variable-length; BASELINE config 5)."""
    from wordgesture_gan_tpu.cli_common import resolve_dataset_zip
    from wordgesture_gan_tpu.data.variable_length import (
        create_variable_split,
        load_variable_dataset_from_zip,
    )
    from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
    from wordgesture_gan_tpu.train.variable_loop import train_variable_gan

    keyboard = QWERTYKeyboard()
    zip_path = resolve_dataset_zip(args)
    by_word, _ = load_variable_dataset_from_zip(
        zip_path, keyboard, max_len=model_config.seq_length, arc_step=args.arc_step,
        max_samples_per_word=training_config.max_samples_per_word,
        max_files=args.max_files, seed=args.seed,
    )
    train_ds, test_ds = create_variable_split(
        by_word, keyboard, max_len=model_config.seq_length,
        train_ratio=training_config.train_ratio, seed=args.seed,
    )
    log(f"Data: {len(train_ds)} train, {len(test_ds)} test (variable-length)")

    # Same architecture-knob sidecar as the fixed-length path, so
    # eval_gan.py --variable-length restores the trained head.
    from wordgesture_gan_tpu.train.checkpoint import save_run_metadata

    save_run_metadata(args.checkpoint_dir,
                      generator_type=model_config.generator_type,
                      time_head=model_config.time_head,
                      gen_hidden_dim=model_config.gen_hidden_dim)

    train_variable_gan(
        train_ds,
        model_config=model_config,
        training_config=training_config,
        runtime_config=runtime_config,
        num_epochs=args.epochs,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        resume=not args.no_resume,
    )
    log("Training complete!")


if __name__ == "__main__":
    main()
