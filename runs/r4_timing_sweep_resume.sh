#!/bin/bash
# Continuation of runs/r4_timing_sweep.sh after a driver preemption killed it
# during the dt4 stage (epoch 30/200). The mono stage (train + eval, GAN+MJ)
# completed; this script resumes dt4 from its checkpoint and runs the
# remaining stages unchanged. Corpus + caches are already in place.
cd /root/repo
set -x

for combo in "dt4:--lambda-dt 4" "dt16:--lambda-dt 16" "sp2:--lambda-speed 2" "dt8sp1:--lambda-dt 8 --lambda-speed 1"; do
  name="${combo%%:*}"; flags="${combo#*:}"
  python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
      $flags --checkpoint-dir "runs/r4_${name}" \
      >> "runs/r4_train_${name}.log" 2>&1 || { echo "TRAIN_FAIL ${name}"; continue; }
  python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
      --checkpoint-dir "runs/r4_${name}" \
      > "runs/r4_eval_${name}.log" 2>&1 || echo "EVAL_FAIL ${name}"
done

for tr in 0.7 0.5; do
  python eval_gan.py --model gan --n-samples 2000 --synthetic --synthetic-users 1338 \
      --truncation $tr --checkpoint-dir runs/r4_mono \
      > "runs/r4_eval_mono_trunc${tr}.log" 2>&1 || echo "EVAL_FAIL trunc${tr}"
done

rm -rf runs/r4_contrastive
python train_contrastive.py --epochs 100 --synthetic --synthetic-users 1338 \
    --checkpoint-dir runs/r4_contrastive \
    > runs/r4_train_contrastive.log 2>&1 || echo "TRAIN_FAIL contrastive"
python eval_contrastive.py --centroids --synthetic --synthetic-users 1338 \
    --checkpoint-dir runs/r4_contrastive \
    > runs/r4_eval_contrastive.log 2>&1 || echo "EVAL_FAIL contrastive"
echo "SWEEP_DONE"
