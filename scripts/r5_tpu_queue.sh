#!/bin/bash
# Round-5 TPU queue: training runs + evals, sequential (one TPU tunnel).
#
# Targets (VERDICT round-4 "next round" items 1, 2, 4, 5):
#   1. r5_base          skip-free STE, reference rate schedule (r4 twin rebuilt;
#                       the r4 checkpoints were pruned, 38 GB) -> anti-monotone
#                       documentation + fine-tune start + int8 gate checkpoint
#   2. r5_rate_control  fine-tune of r5_base under rate_mode='fixed' -> the
#                       10-point monotone sweep
#   3. r5_zero_fixed    skip_mode='zero', rate_mode='fixed', from scratch
#                       (clean twin for the mask-conditioning delta)
#   4. r5_mask_cond     skip_mode='mask', rate_mode='fixed', from scratch
#                       (the >= +1 dB at fixed container bpp candidate)
#   5. r5_faithful      encoder-skip reference topology (the shootout's
#                       forward-path point; r2_faithful equivalent)
# then: ceiling evals (quant_bypass), 10-point sweeps, int8 parity gate.
# Intermediate epoch checkpoints are pruned after each run (keep *_final).
set -u
cd /root/repo

TRAIN="--synthetic 2048 --synthetic-rich --vgg-weights random --save-mode host"

prune() { # keep only *_final.msgpack + final metadata in a ckpt dir
  find "$1" -name "*_epoch_*.msgpack" -delete 2>/dev/null
  find "$1" -name "metadata_epoch_*.json" -delete 2>/dev/null
}

echo "=== [1/10] train r5_base (skip-free STE, reference schedule) ==="
timeout 3000 python scripts/train_gan.py $TRAIN --epochs 20 --no-resume \
  --skip-mode zero --quant-grad-mode ste \
  --results-dir runs/r5_base/results --model-dir runs/r5_base/models_ckpt \
  2>&1 | grep -v "^WARNING" | tee runs/r5_base_train.log
prune runs/r5_base/models_ckpt

echo "=== [2/10] fine-tune under rate_mode=fixed -> r5_rate_control ==="
mkdir -p runs/r5_rate_control/fixed_ft
cp -r runs/r5_base/models_ckpt runs/r5_rate_control/fixed_ft/models_ckpt
timeout 2000 python scripts/train_gan.py $TRAIN --epochs 6 \
  --skip-mode zero --quant-grad-mode ste --rate-mode fixed \
  --results-dir runs/r5_rate_control/fixed_ft/results \
  --model-dir runs/r5_rate_control/fixed_ft/models_ckpt \
  2>&1 | grep -v "^WARNING" | tee runs/r5_rate_control/fixed_ft_train.log
prune runs/r5_rate_control/fixed_ft/models_ckpt

echo "=== [3/10] 10-point sweep: fixed schedule (the monotone curve) ==="
timeout 1500 python scripts/eval_bitstream.py \
  --model-dir runs/r5_rate_control/fixed_ft/models_ckpt \
  --skip-mode zero --rate-mode fixed --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 0.3111 0.5222 0.7333 0.9444 1.1556 1.3667 1.5778 1.7889 2.0 \
  --out runs/r5_rate_control/fixed_sweep.json \
  2>&1 | grep -v "^WARNING" | tee runs/r5_rate_control/fixed_sweep.log

echo "=== [4/10] 10-point sweep: faithful schedule (the anti-monotone record) ==="
timeout 1500 python scripts/eval_bitstream.py \
  --model-dir runs/r5_base/models_ckpt \
  --skip-mode zero --rate-mode reference --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 0.3111 0.5222 0.7333 0.9444 1.1556 1.3667 1.5778 1.7889 2.0 \
  --out runs/r5_rate_control/reference_sweep.json \
  2>&1 | grep -v "^WARNING" | tee runs/r5_rate_control/reference_sweep.log

echo "=== [5/10] ceiling: r5_base with quantization bypassed ==="
timeout 1200 python scripts/eval_bitstream.py \
  --model-dir runs/r5_base/models_ckpt \
  --skip-mode zero --quant-bypass --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 1.0 2.0 \
  --out runs/r5_rate_control/base_ceiling.json \
  2>&1 | grep -v "^WARNING" | tee runs/r5_rate_control/base_ceiling.log

echo "=== [6/10] train r5_zero_fixed (clean fixed-schedule twin) ==="
timeout 3000 python scripts/train_gan.py $TRAIN --epochs 20 --no-resume \
  --skip-mode zero --quant-grad-mode ste --rate-mode fixed \
  --results-dir runs/r5_zero_fixed/results --model-dir runs/r5_zero_fixed/models_ckpt \
  2>&1 | grep -v "^WARNING" | tee runs/r5_zero_fixed_train.log
prune runs/r5_zero_fixed/models_ckpt

echo "=== [7/10] train r5_mask_cond (mask-conditioned twin) ==="
timeout 3000 python scripts/train_gan.py $TRAIN --epochs 20 --no-resume \
  --skip-mode mask --quant-grad-mode ste --rate-mode fixed \
  --results-dir runs/r5_mask_cond/results --model-dir runs/r5_mask_cond/models_ckpt \
  2>&1 | grep -v "^WARNING" | tee runs/r5_mask_cond_train.log
prune runs/r5_mask_cond/models_ckpt

echo "=== [8/10] mask-conditioning delta: twin evals at matched settings ==="
timeout 1500 python scripts/eval_bitstream.py \
  --model-dir runs/r5_zero_fixed/models_ckpt \
  --skip-mode zero --rate-mode fixed --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 1.0 2.0 \
  --out runs/r5_mask_cond/zero_twin_eval.json \
  2>&1 | grep -v "^WARNING" | tee runs/r5_mask_cond/zero_twin_eval.log
timeout 1500 python scripts/eval_bitstream.py \
  --model-dir runs/r5_mask_cond/models_ckpt \
  --skip-mode mask --rate-mode fixed --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 1.0 2.0 \
  --out runs/r5_mask_cond/mask_cond_eval.json \
  2>&1 | grep -v "^WARNING" | tee runs/r5_mask_cond/mask_cond_eval.log
timeout 1200 python scripts/eval_bitstream.py \
  --model-dir runs/r5_mask_cond/models_ckpt \
  --skip-mode mask --rate-mode fixed --quant-bypass \
  --synthetic 32 --synthetic-rich --seed 7 --bpps 0.1 1.0 2.0 \
  --out runs/r5_mask_cond/mask_cond_ceiling.json \
  2>&1 | grep -v "^WARNING" | tee runs/r5_mask_cond/mask_cond_ceiling.log

echo "=== [9/10] train r5_faithful (encoder-skip, the shootout fwd-path point) ==="
timeout 3000 python scripts/train_gan.py $TRAIN --epochs 20 --no-resume \
  --skip-mode encoder \
  --results-dir runs/r5_faithful/results --model-dir runs/r5_faithful/models_ckpt \
  2>&1 | grep -v "^WARNING" | tee runs/r5_faithful_train.log
prune runs/r5_faithful/models_ckpt

echo "=== [10/10] int8 tail parity gate on the trained r5_base checkpoint ==="
timeout 1800 python scripts/r4_int8_tail_parity.py runs/r5_base/models_ckpt \
  runs/r5_int8_tail_parity.json \
  2>&1 | grep -v "^WARNING" | tee runs/r5_int8_tail_parity.log

echo "=== queue done ==="
