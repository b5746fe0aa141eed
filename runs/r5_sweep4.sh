#!/bin/bash
# Round-5 quality sweep, batch 4 — the flagship combo and the dt-corr push.
#
# Context from batch 3: div03 (λ_div=0.3 hinge + λ_speed=2) hits recall
# 0.901 / precision 0.912 and wins 7/9 vs min-jerk, losing only dt-corr
# (0.049 vs 0.061) and recall-vs-minjerk. dtc4 (λ_dtc=4) alone reaches
# dt-corr 0.162 (ceiling for a conditional-mean generator on this corpus:
# 0.269, runs/r5_dt_ceiling.json) AND lifts recall to 0.730. So:
#   flag  = div03 + dtc4 combined   → target: recall ≥0.9 AND dt-corr win
#   dtc8  = λ_dtc=8                 → target: dt-corr ≥0.19 (VERDICT #4)
cd /root/repo
set -x

for combo in "flag:--lambda-speed 2 --lambda-div 0.3 --lambda-dtc 4" \
             "dtc8:--lambda-speed 2 --lambda-dtc 8"; do
  name="${combo%%:*}"; flags="${combo#*:}"
  rm -rf "runs/r5_${name}"
  python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
      $flags --checkpoint-dir "runs/r5_${name}" \
      > "runs/r5_train_${name}.log" 2>&1 || { echo "TRAIN_FAIL ${name}"; continue; }
  python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
      --checkpoint-dir "runs/r5_${name}" \
      > "runs/r5_eval_${name}.log" 2>&1 || echo "EVAL_FAIL ${name}"
  for tr in 1.25 1.5; do
    python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
        --truncation $tr --fast --checkpoint-dir "runs/r5_${name}" \
        > "runs/r5_eval_${name}_trunc${tr}.log" 2>&1 || echo "EVAL_FAIL ${name}_trunc${tr}"
  done
done

# -- quantify the exact-DTW vs reference-fastdtw delta (VERDICT r4 #2) --
python runs/r5_dtw_delta.py --checkpoint-dir runs/r5_base --n 2000 \
    --synthetic --synthetic-users 1338 \
    > runs/r5_dtw_delta.log 2>&1 || echo "DTW_DELTA_FAIL"

echo "SWEEP4_DONE"
