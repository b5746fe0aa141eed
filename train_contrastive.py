#!/usr/bin/env python
"""Train the contrastive gesture encoder on TPU.

CLI-parity entry point with the reference
(/root/reference/train_contrastive.py:204-231): ``--epochs``, ``--no-resume``,
``--augment-min-jerk``, ``--min-jerk-noise``, ``--min-jerk-augmentations``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from wordgesture_gan_tpu.cli_common import add_data_args, resolve_dataset_zip
from wordgesture_gan_tpu.configs import (
    ContrastiveConfig,
    ModelConfig,
    RuntimeConfig,
    TrainingConfig,
)
from wordgesture_gan_tpu.utils.logging import log, seed_everything


def main() -> None:
    parser = argparse.ArgumentParser(description="Train contrastive gesture encoder (TPU)")
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--augment-min-jerk", action="store_true",
                        help="add min-jerk trajectories as synthetic positives")
    parser.add_argument("--min-jerk-noise", type=float, default=0.02)
    parser.add_argument("--min-jerk-augmentations", type=int, default=2)
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--data-axis-size", type=int, default=-1,
                        help="devices on the data mesh axis (-1 = all)")
    add_data_args(parser)
    args = parser.parse_args()

    from wordgesture_gan_tpu.parallel import maybe_init_distributed

    maybe_init_distributed()   # no-op single-host; joins the pod runtime when configured
    from wordgesture_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    log(f"Devices: {jax.devices()}")
    seed_everything(args.seed)

    from wordgesture_gan_tpu.data.contrastive import create_contrastive_datasets
    from wordgesture_gan_tpu.data.pipeline import load_dataset_from_zip
    from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
    from wordgesture_gan_tpu.train.contrastive_loop import train_contrastive

    config = ContrastiveConfig(num_epochs=args.epochs)
    keyboard = QWERTYKeyboard()
    zip_path = resolve_dataset_zip(args)
    gestures, _protos = load_dataset_from_zip(
        zip_path, keyboard, ModelConfig(), TrainingConfig(), max_files=args.max_files,
    )

    train_data, test_data = create_contrastive_datasets(
        gestures,
        train_ratio=0.8,
        seed=args.seed,
        augment_min_jerk=args.augment_min_jerk,
        keyboard=keyboard,
        min_jerk_augmentations=args.min_jerk_augmentations,
        min_jerk_noise=args.min_jerk_noise,
    )

    state, history = train_contrastive(
        train_data,
        test_data,
        config=config,
        runtime_config=RuntimeConfig(data_axis_size=args.data_axis_size),
        num_epochs=args.epochs,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        resume=not args.no_resume,
    )
    if history.get("test_recall@1"):
        log(f"Best recall@1: {max(history['test_recall@1']):.4f}")
    log("Training complete!")


if __name__ == "__main__":
    main()
