#!/bin/bash
# Round-5 batch 7 — recovery of batch 6 after the flag2 trainer wedged on a
# dead tunnel RPC at epoch 105 (0% CPU, sleeping): resume flag2 from the
# epoch-100 checkpoint, eval it, then run the fixed dtw-delta measurement.
cd /root/repo
set -x

python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
    --lambda-speed 2 --lambda-div 0.6 --lambda-dtc 6 --checkpoint-dir runs/r5_flag2 \
    >> runs/r5_train_flag2.log 2>&1 || echo "TRAIN_FAIL flag2"
python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
    --checkpoint-dir runs/r5_flag2 \
    > runs/r5_eval_flag2.log 2>&1 || echo "EVAL_FAIL flag2"
python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
    --truncation 1.25 --fast --checkpoint-dir runs/r5_flag2 \
    > runs/r5_eval_flag2_trunc1.25.log 2>&1 || echo "EVAL_FAIL flag2_trunc"

python runs/r5_dtw_delta.py --checkpoint-dir runs/r5_flag --synthetic \
    --synthetic-users 1338 \
    > runs/r5_dtw_delta.log 2>&1 || echo "DTW_DELTA_FAIL"

echo "SWEEP7_DONE"
