#!/usr/bin/env python
"""Bulk gesture synthesis (the serving path): words → prototypes → GAN
samples → .npz.

No reference CLI equivalent — the reference only samples inside eval
(eval_gan.py:131-135); this exposes the same generator as a production
entry point. On one TPU chip the BiLSTM path sustains ~38M gestures/min
device-side (the fused Pallas kernel inside one scanned program; see
README Performance).

Examples:
    # 10 samples for each word in a file (one word per line)
    python generate_gestures.py --words-file words.txt --samples-per-word 10

    # 100k samples over a comma-separated vocabulary, bf16, with truncation
    python generate_gestures.py --words the,quick,brown --n 100000 \\
        --precision bfloat16 --truncation 0.7 --out gestures.npz
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--words", type=str, default=None,
                        help="comma-separated words to synthesize")
    parser.add_argument("--words-file", type=str, default=None,
                        help="file with one word per line")
    parser.add_argument("--n", type=int, default=0,
                        help="total samples (cycled over the vocabulary); "
                             "0 → samples-per-word for every word")
    parser.add_argument("--samples-per-word", type=int, default=1)
    parser.add_argument("--truncation", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--out", type=str, default="gestures.npz")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--generator", choices=["bilstm", "mlp", "transformer"],
                        default=None, help="default: the checkpoint's run metadata")
    parser.add_argument("--time-head", choices=["tanh", "monotone"], default=None,
                        help="default: the checkpoint's run metadata")
    parser.add_argument("--precision", choices=["float32", "bfloat16"],
                        default="bfloat16")
    args = parser.parse_args()

    from wordgesture_gan_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np

    from wordgesture_gan_tpu.configs import ModelConfig, TrainingConfig
    from wordgesture_gan_tpu.keyboard import QWERTYKeyboard
    from wordgesture_gan_tpu.train.checkpoint import restore_checkpoint
    from wordgesture_gan_tpu.train.gan_loop import generate_gestures
    from wordgesture_gan_tpu.train.state import init_gan_state
    from wordgesture_gan_tpu.utils.logging import log

    words = []
    if args.words:
        words += [w.strip().lower() for w in args.words.split(",") if w.strip()]
    if args.words_file:
        words += [w.strip().lower() for w in Path(args.words_file).read_text().split()
                  if w.strip()]
    if not words:
        parser.error("provide --words or --words-file")

    from wordgesture_gan_tpu.train.checkpoint import load_run_metadata

    meta = load_run_metadata(args.checkpoint_dir)
    args.generator = args.generator or meta.get("generator_type", "bilstm")
    model_config = ModelConfig(generator_type=args.generator,
                               time_head=args.time_head or meta.get("time_head", "tanh"),
                               gen_hidden_dim=meta.get("gen_hidden_dim", 48),
                               compute_dtype=args.precision)
    template = init_gan_state(args.seed, model_config, TrainingConfig())
    state = restore_checkpoint(template, args.checkpoint_dir)
    if state is None:
        log(f"No checkpoint in {args.checkpoint_dir!r} — train first "
            f"(python train_gan.py).")
        sys.exit(1)

    keyboard = QWERTYKeyboard()
    L = model_config.seq_length
    protos_by_word = {w: np.asarray(keyboard.get_word_prototype(w, L), np.float32)
                      for w in dict.fromkeys(words)}

    if args.n > 0:
        idx = np.arange(args.n) % len(words)
    else:
        idx = np.repeat(np.arange(len(words)), args.samples_per_word)
    out_words = [words[i] for i in idx]
    protos = np.stack([protos_by_word[w] for w in out_words])

    log(f"Generating {len(protos)} gestures over {len(protos_by_word)} words "
        f"({args.generator}, {args.precision}, truncation {args.truncation})")
    t0 = time.perf_counter()
    gestures = generate_gestures(state, protos, model_config,
                                 truncation=args.truncation, seed=args.seed,
                                 batch=args.batch)
    dt = time.perf_counter() - t0
    log(f"Done in {dt:.2f}s ({len(protos) / max(dt, 1e-9) * 60 / 1e6:.2f}M "
        f"gestures/min incl. host transfers)")

    np.savez_compressed(args.out, gestures=gestures, words=np.asarray(out_words),
                        prototypes=protos)
    log(f"Wrote {args.out}: gestures {gestures.shape}, "
        f"range [{gestures.min():.3f}, {gestures.max():.3f}]")


if __name__ == "__main__":
    main()
