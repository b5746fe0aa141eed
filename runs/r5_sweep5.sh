#!/bin/bash
# Round-5 quality sweep, batch 5 — varlen flagship RETRAIN with the masked
# monotone time head (the first varlen run trained with the silently-forced
# tanh head and evaluated at velocity corr 0.010; commit ec42bb7 fixed the
# head and this run is its quality evidence — VERDICT r4 item 3).
cd /root/repo
set -x

rm -rf runs/r5_varlen2
python train_gan.py --variable-length --epochs 200 --synthetic --synthetic-users 1338 \
    --lambda-speed 2 --checkpoint-dir runs/r5_varlen2 \
    > runs/r5_train_varlen2.log 2>&1 || echo "TRAIN_FAIL varlen2"
python eval_gan.py --variable-length --model gan --n-samples 2000 \
    --synthetic --synthetic-users 1338 --checkpoint-dir runs/r5_varlen2 \
    > runs/r5_eval_varlen2.log 2>&1 || echo "EVAL_FAIL varlen2"

echo "SWEEP5_DONE"
