#!/bin/bash
# Resume of scripts/r5_steps6to10.sh after the 08:46 session kill: step 6
# (r5_zero_fixed) completed and is committed; the r5_mask_cond training was
# killed at epoch 6/20 with no checkpoint, so rerun step 7 and everything after.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

TRAIN="--synthetic 2048 --synthetic-rich --vgg-weights random --save-mode host"

echo "=== [7/10] train r5_mask_cond (mask-conditioned twin) ==="
timeout 4500 python scripts/train_gan.py $TRAIN --epochs 20 --no-resume --no-fine-tune \
  --skip-mode mask --quant-grad-mode ste --rate-mode fixed --checkpoint-every 999 \
  --branch-recon-weight 0.2 \
  --results-dir runs/r5_mask_cond/results --model-dir runs/r5_mask_cond/models_ckpt \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_mask_cond_train.log

echo "=== [8a/10] 10-point monotone sweep on the branch-recon fixed twin ==="
timeout 2400 python scripts/eval_bitstream.py \
  --model-dir runs/r5_zero_fixed/models_ckpt \
  --skip-mode zero --rate-mode fixed --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 0.3111 0.5222 0.7333 0.9444 1.1556 1.3667 1.5778 1.7889 2.0 \
  --out runs/r5_rate_control/fixed_branchtrained_sweep.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_rate_control/fixed_branchtrained_sweep.log

echo "=== [8/10] mask-conditioning delta: twin evals at matched settings ==="
mkdir -p runs/r5_mask_cond
timeout 1800 python scripts/eval_bitstream.py \
  --model-dir runs/r5_zero_fixed/models_ckpt \
  --skip-mode zero --rate-mode fixed --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 1.0 2.0 \
  --out runs/r5_mask_cond/zero_twin_eval.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_mask_cond/zero_twin_eval.log
timeout 1800 python scripts/eval_bitstream.py \
  --model-dir runs/r5_mask_cond/models_ckpt \
  --skip-mode mask --rate-mode fixed --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 1.0 2.0 \
  --out runs/r5_mask_cond/mask_cond_eval.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_mask_cond/mask_cond_eval.log
timeout 1800 python scripts/eval_bitstream.py \
  --model-dir runs/r5_mask_cond/models_ckpt \
  --skip-mode mask --rate-mode fixed --quant-bypass \
  --synthetic 32 --synthetic-rich --seed 7 --bpps 0.1 1.0 2.0 \
  --out runs/r5_mask_cond/mask_cond_ceiling.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_mask_cond/mask_cond_ceiling.log

echo "=== [9/10] train r5_faithful (encoder-skip, r2_faithful flags, 20 epochs) ==="
timeout 4500 python scripts/train_gan.py \
  --synthetic 2048 --synthetic-rich --save-mode host --no-perceptual \
  --epochs 20 --no-resume --no-fine-tune --checkpoint-every 999 \
  --skip-mode encoder --bn-mode frozen --disc-bn-mode frozen \
  --quant-grad-mode reference --broadcast-quirk \
  --results-dir runs/r5_faithful/results --model-dir runs/r5_faithful/models_ckpt \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_faithful_train.log

echo "=== [10/10] int8 tail parity gate on the trained r5_base checkpoint ==="
timeout 2400 python scripts/r4_int8_tail_parity.py runs/r5_base/models_ckpt \
  runs/r5_int8_tail_parity.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_int8_tail_parity.log

echo "=== steps 7-10 done ==="
