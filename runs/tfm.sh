#!/bin/bash
cd /root/repo
set -eo pipefail
python train_gan.py --epochs 200 --generator transformer \
    --checkpoint-dir runs/gan_tfm 2>&1 | tee runs/train_tfm.log || exit 1
python eval_gan.py --model gan --n-samples 2000 --generator transformer \
    --checkpoint-dir runs/gan_tfm 2>&1 | tee runs/eval_tfm.log || exit 1
echo "TFM_DONE"
