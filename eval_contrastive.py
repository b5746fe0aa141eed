#!/usr/bin/env python
"""Evaluate the contrastive gesture encoder.

CLI-parity entry point with the reference
(/root/reference/eval_contrastive.py:375-403): retrieval recall/mAP by
default, plus ``--centroids`` (real vs min-jerk centroid quality),
``--tsne`` (embedding visualization), ``--query WORD`` (similarity search).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

from wordgesture_gan_tpu.cli_common import add_data_args, resolve_dataset_zip
from wordgesture_gan_tpu.configs import ContrastiveConfig, ModelConfig, TrainingConfig
from wordgesture_gan_tpu.utils.logging import log, seed_everything


def main() -> None:
    parser = argparse.ArgumentParser(description="Evaluate contrastive gesture encoder (TPU)")
    parser.add_argument("--centroids", action="store_true",
                        help="evaluate real vs min-jerk centroid quality")
    parser.add_argument("--tsne", action="store_true", help="save a t-SNE plot")
    parser.add_argument("--query", type=str, default=None,
                        help="similarity-search a word's first test gesture")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--output-dir", type=str, default="eval_output")
    add_data_args(parser)
    args = parser.parse_args()

    from wordgesture_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    log(f"Devices: {jax.devices()}")
    seed_everything(args.seed)

    from wordgesture_gan_tpu.data.contrastive import create_contrastive_datasets
    from wordgesture_gan_tpu.data.pipeline import load_dataset_from_zip
    from wordgesture_gan_tpu.eval.contrastive_eval import (
        create_tsne_plot,
        evaluate_centroids,
        evaluate_recall,
        similarity_search,
    )
    from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
    from wordgesture_gan_tpu.train.contrastive_loop import (
        embed_gestures,
        init_contrastive_state,
    )
    from wordgesture_gan_tpu.train.checkpoint import restore_checkpoint

    config = ContrastiveConfig()
    keyboard = QWERTYKeyboard()
    zip_path = resolve_dataset_zip(args)
    gestures, _ = load_dataset_from_zip(
        zip_path, keyboard, ModelConfig(), TrainingConfig(), max_files=args.max_files,
    )

    template = init_contrastive_state(args.seed, config)
    state = restore_checkpoint(template, args.checkpoint_dir, name="contrastive_latest")
    if state is None:
        log(f"ERROR: no contrastive checkpoint in {args.checkpoint_dir}")
        sys.exit(1)
    log(f"Loaded contrastive checkpoint (epoch {int(np.asarray(state['epoch']))}, "
        f"best recall@1 {float(np.asarray(state['best_recall'])):.4f})")

    # Rebuild the same split as training (same seed).
    train_data, test_data = create_contrastive_datasets(gestures, 0.8, seed=args.seed)

    log("Embedding test set...")
    embeddings = embed_gestures(state, test_data.gestures, config)

    results = evaluate_recall(embeddings, test_data.labels)
    log("")
    log("=" * 50)
    log("Retrieval metrics (test set)")
    log("=" * 50)
    for key, val in results.items():
        log(f"  {key:<12} {val:.4f}")
    log("=" * 50)

    if args.query:
        q_idx = next((i for i, w in enumerate(test_data.words) if w == args.query), None)
        if q_idx is None:
            log(f"Query word '{args.query}' not in test set")
        else:
            hits = similarity_search(embeddings[q_idx], embeddings, test_data.words)
            log(f"Top matches for '{args.query}':")
            for h in hits:
                log(f"  {h['word']:<16} sim={h['similarity']:.4f}")

    out_dir = Path(args.output_dir)
    if args.tsne:
        out_dir.mkdir(parents=True, exist_ok=True)
        create_tsne_plot(embeddings, test_data.words, str(out_dir / "tsne.png"))

    if args.centroids:
        evaluate_centroids(state, gestures, keyboard, config, seed=args.seed)

    log("")
    log("Done.")


if __name__ == "__main__":
    main()
