#!/bin/bash
# Round-2 runs/ refresh on the adversarially-realistic synthetic dataset.
cd /root/repo
set -eo pipefail
set -x
rm -f dataset/synthetic_swipelogs_1338.zip dataset/synthetic_swipelogs_200.zip dataset/.cache_*.pkl
rm -rf runs/gan_full
python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
    --checkpoint-dir runs/gan_full 2>&1 | tee runs/train_full.log || exit 1
python eval_gan.py --model both --n-samples 2000 --synthetic --synthetic-users 1338 \
    --checkpoint-dir runs/gan_full 2>&1 | tee runs/eval_full.log || exit 1
python train_contrastive.py --epochs 100 --synthetic --synthetic-users 1338 \
    --checkpoint-dir runs/gan_full 2>&1 | tee runs/train_contrastive.log || exit 1
python eval_contrastive.py --centroids --synthetic --synthetic-users 1338 \
    --checkpoint-dir runs/gan_full 2>&1 | tee runs/eval_contrastive.log || exit 1
echo "REFRESH_DONE"
