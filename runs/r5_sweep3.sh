#!/bin/bash
# Round-5 quality sweep, batch 3 — the hinged-diversity loss (new this
# round: losses.diversity_hinge_loss, margin measured from the corpus's
# within-word spread) and the variable-length flagship (VERDICT r4 item 3).
#
# Context from batches 1-2: the MSGAN ratio overshoots at every tried λ
# (precision 0.981→0.30 even at λ_ms=0.2) because it rewards unbounded
# output spread; truncation 1.25/1.5 at eval buys recall 0.653→0.713/0.793
# with precision ~0.97 intact. The hinge should move the training-side
# tradeoff point; truncation stacks on top at eval time.
cd /root/repo
set -x

for combo in "div1:--lambda-speed 2 --lambda-div 1" \
             "div03:--lambda-speed 2 --lambda-div 0.3"; do
  name="${combo%%:*}"; flags="${combo#*:}"
  rm -rf "runs/r5_${name}"
  python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
      $flags --checkpoint-dir "runs/r5_${name}" \
      > "runs/r5_train_${name}.log" 2>&1 || { echo "TRAIN_FAIL ${name}"; continue; }
  python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
      --checkpoint-dir "runs/r5_${name}" \
      > "runs/r5_eval_${name}.log" 2>&1 || echo "EVAL_FAIL ${name}"
  for tr in 1.5 2.0; do
    python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
        --truncation $tr --fast --checkpoint-dir "runs/r5_${name}" \
        > "runs/r5_eval_${name}_trunc${tr}.log" 2>&1 || echo "EVAL_FAIL ${name}_trunc${tr}"
  done
done

# -- variable-length flagship (BASELINE config 5 quality evidence) --
rm -rf runs/r5_varlen
python train_gan.py --variable-length --epochs 200 --synthetic --synthetic-users 1338 \
    --lambda-speed 2 --checkpoint-dir runs/r5_varlen \
    > runs/r5_train_varlen.log 2>&1 || echo "TRAIN_FAIL varlen"
python eval_gan.py --variable-length --model gan --n-samples 2000 \
    --synthetic --synthetic-users 1338 --checkpoint-dir runs/r5_varlen \
    > runs/r5_eval_varlen.log 2>&1 || echo "EVAL_FAIL varlen"

echo "SWEEP3_DONE"
