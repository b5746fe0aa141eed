#!/bin/bash
# Round-5 quality sweep, batch 1 — VERDICT r4 items 1 (recall) and 4
# (time-delta corr):
#
# 1. r5_base   — retrain the r4 flagship (lambda_speed=2) as the control:
#                r4 checkpoints' weight dirs were not committed, and this
#                round needs a live checkpoint for the truncation-protocol
#                study and the DTW-delta measurement. GAN + min-jerk eval.
# 2. r5_ms1 / r5_ms02 — MSGAN mode-seeking (lambda_ms 1 / 0.2) on top of
#                the control: the direct mode-coverage attack on recall.
# 3. r5_kld01  — 5x stronger KLD (0.1): tighter posterior/prior match so
#                eval-time z ~ N(0,1) covers the encoder's latent support.
# 4. r5_dtc4   — dt-pattern Pearson loss (lambda_dtc=4): the differentiable
#                twin of the time-delta-correlation metric.
# 5. truncation-protocol study (1.25 / 1.5 / 2.0) on base and ms1: recall
#                vs the z-sampling radius at eval, no retraining.
#
# Same corpus/flags as the r4 sweep (synthetic 1338 users, bf16, 200
# epochs) so rows are comparable with runs/r4_eval_*.log.
cd /root/repo
set -x

for combo in "base:--lambda-speed 2" \
             "ms1:--lambda-speed 2 --lambda-ms 1" \
             "ms02:--lambda-speed 2 --lambda-ms 0.2" \
             "kld01:--lambda-speed 2 --lambda-kld 0.1" \
             "dtc4:--lambda-speed 2 --lambda-dtc 4"; do
  name="${combo%%:*}"; flags="${combo#*:}"
  rm -rf "runs/r5_${name}"
  python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
      $flags --checkpoint-dir "runs/r5_${name}" \
      > "runs/r5_train_${name}.log" 2>&1 || { echo "TRAIN_FAIL ${name}"; continue; }
  model=gan; [ "$name" = base ] && model=both
  python eval_gan.py --model $model --n-samples 2000 --synthetic --synthetic-users 1338 \
      --checkpoint-dir "runs/r5_${name}" \
      > "runs/r5_eval_${name}.log" 2>&1 || echo "EVAL_FAIL ${name}"
done

for ckpt in base ms1; do
  for tr in 1.25 1.5 2.0; do
    python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
        --truncation $tr --fast --checkpoint-dir "runs/r5_${ckpt}" \
        > "runs/r5_eval_${ckpt}_trunc${tr}.log" 2>&1 || echo "EVAL_FAIL ${ckpt}_trunc${tr}"
  done
done
echo "SWEEP1_DONE"
