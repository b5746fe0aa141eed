#!/bin/bash
# Round-5 quality sweep, batch 2 — continues runs/r5_sweep.sh after the
# preemption that stopped it mid-kld01 (epoch 1/200).
#
# Batch-1 readout (runs/r5_eval_{base,ms1,ms02}.log):
#   base  : recall 0.653 / precision 0.981 — the known single loss vs MJ.
#   ms1   : recall 0.879 but precision 0.172, vel corr 0.058 — λ_ms=1 far
#           too strong; the mode-seeking gradient flattens the conditional.
#   ms02  : recall 0.862 / precision 0.298 — still too strong.
# So this batch walks the OTHER end of the tradeoff:
#   1. truncation >1 at eval on the base ckpt (no retraining): widen the z
#      radius to spend the huge precision headroom (0.981 vs MJ's 0.666)
#      on recall.
#   2. λ_ms=0.05 — an order gentler than batch 1's smallest.
#   3. kld01 resume (tighter posterior↔prior match) and dtc4 (Pearson
#      dt-corr loss, VERDICT item 4) that the preemption cut.
#   4. the exact-DTW↔fastdtw band measurement (VERDICT item 2).
#   5. ms02 + truncation 0.7: can shrinking z at eval buy precision back?
cd /root/repo
set -x

# -- 1. truncation protocol study on the base checkpoint (cheap, --fast) --
for tr in 1.25 1.5 2.0; do
  python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
      --truncation $tr --fast --checkpoint-dir runs/r5_base \
      > "runs/r5_eval_base_trunc${tr}.log" 2>&1 || echo "EVAL_FAIL base_trunc${tr}"
done
python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
    --truncation 0.7 --fast --checkpoint-dir runs/r5_ms02 \
    > "runs/r5_eval_ms02_trunc0.7.log" 2>&1 || echo "EVAL_FAIL ms02_trunc0.7"

# -- 2. remaining lambda points (kld01 resumes from its epoch_1 ckpt) --
for combo in "kld01:--lambda-speed 2 --lambda-kld 0.1" \
             "dtc4:--lambda-speed 2 --lambda-dtc 4" \
             "ms005:--lambda-speed 2 --lambda-ms 0.05"; do
  name="${combo%%:*}"; flags="${combo#*:}"
  python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
      $flags --checkpoint-dir "runs/r5_${name}" \
      >> "runs/r5_train_${name}.log" 2>&1 || { echo "TRAIN_FAIL ${name}"; continue; }
  python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
      --checkpoint-dir "runs/r5_${name}" \
      > "runs/r5_eval_${name}.log" 2>&1 || echo "EVAL_FAIL ${name}"
done

# -- 3. exact-DTW vs fastdtw band (VERDICT item 2) --
python runs/r5_dtw_delta.py --checkpoint-dir runs/r5_base --n 2000 \
    > runs/r5_dtw_delta.log 2>&1 || echo "DTW_DELTA_FAIL"

echo "SWEEP2_DONE"
