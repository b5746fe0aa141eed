#!/bin/bash
# Round-4 quality sweep, on a corpus REGENERATED from the committed
# synthetic generator (the previous dataset/synthetic_swipelogs_1338.zip
# predated 792251d's per-trace style jitter, so runs/r4_bilstm_mono_full
# was not reproducible from the committed code).
#
# 1. fresh corpus
# 2. monotone-head baseline (lambda_dt = lambda_speed = 0), GAN + min-jerk eval
# 3. timing-dynamics lambda combos (GAN-only eval; min-jerk side from step 2)
# 4. eval-truncation ablation on the baseline
# 5. contrastive retrain + centroid eval (VERDICT item 6 evidence)
cd /root/repo
set -x

rm -f dataset/synthetic_swipelogs_1338.zip dataset/.cache_synthetic_swipelogs_1338_*.pkl

for combo in "mono:" "dt4:--lambda-dt 4" "dt16:--lambda-dt 16" "sp2:--lambda-speed 2" "dt8sp1:--lambda-dt 8 --lambda-speed 1"; do
  name="${combo%%:*}"; flags="${combo#*:}"
  rm -rf "runs/r4_${name}"
  python train_gan.py --epochs 200 --synthetic --synthetic-users 1338 \
      $flags --checkpoint-dir "runs/r4_${name}" \
      > "runs/r4_train_${name}.log" 2>&1 || { echo "TRAIN_FAIL ${name}"; continue; }
  model=gan; [ "$name" = mono ] && model=both
  python eval_gan.py --model $model --n-samples 2000 --synthetic --synthetic-users 1338 \
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
