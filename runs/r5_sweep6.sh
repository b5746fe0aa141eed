#!/bin/bash
# Round-5 quality sweep, batch 6 — stretch attempt at 9/9 (recall > 0.971)
# and the full (non-fast) eval of the flagship's trunc-1.25 protocol so the
# README row has a DTW number.
#
# Context: flag (div 0.3 + dtc 4) = 8/9 at recall 0.905; div1 (hinge 1.0,
# no dtc) reached recall 0.956 but lost the timing metrics. flag2 probes
# the middle: a stronger hinge WITH the timing losses turned up.
cd /root/repo
set -x

python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
    --truncation 1.25 --checkpoint-dir runs/r5_flag \
    > runs/r5_eval_flag_trunc1.25_full.log 2>&1 || echo "EVAL_FAIL flag_full"

rm -rf runs/r5_flag2
python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
    --lambda-speed 2 --lambda-div 0.6 --lambda-dtc 6 --checkpoint-dir runs/r5_flag2 \
    > runs/r5_train_flag2.log 2>&1 || echo "TRAIN_FAIL flag2"
python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
    --checkpoint-dir runs/r5_flag2 \
    > runs/r5_eval_flag2.log 2>&1 || echo "EVAL_FAIL flag2"
python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
    --truncation 1.25 --fast --checkpoint-dir runs/r5_flag2 \
    > runs/r5_eval_flag2_trunc1.25.log 2>&1 || echo "EVAL_FAIL flag2_trunc"

echo "SWEEP6_DONE"
