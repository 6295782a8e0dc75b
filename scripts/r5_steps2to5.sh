#!/bin/bash
# Round-5 steps 2-5 (run after runs/r5_base completes): rate-control fine-tune,
# the two 10-point sweeps, and the quantization-bypass ceiling eval.
# Replaces the corresponding steps of r5_tpu_queue.sh with (a) final-only
# checkpoint copies, (b) --checkpoint-every 999 / --no-fine-tune on the
# 6-epoch fixed-schedule adaptation, (c) timeouts generous enough to never
# kill a checkpoint save mid-write.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1   # live logs through the grep|tee pipe

TRAIN="--synthetic 2048 --synthetic-rich --vgg-weights random --save-mode host"
SWEEP_BPPS="0.1 0.3111 0.5222 0.7333 0.9444 1.1556 1.3667 1.5778 1.7889 2.0"

echo "=== [2/5] fine-tune under rate_mode=fixed -> r5_rate_control ==="
mkdir -p runs/r5_rate_control/fixed_ft/models_ckpt
cp runs/r5_base/models_ckpt/*_final.msgpack runs/r5_base/models_ckpt/metadata_final.json \
   runs/r5_rate_control/fixed_ft/models_ckpt/
timeout 3600 python scripts/train_gan.py $TRAIN --epochs 6 \
  --skip-mode zero --quant-grad-mode ste --rate-mode fixed \
  --checkpoint-every 999 --no-fine-tune \
  --results-dir runs/r5_rate_control/fixed_ft/results \
  --model-dir runs/r5_rate_control/fixed_ft/models_ckpt \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_rate_control/fixed_ft_train.log

echo "=== [3/5] 10-point sweep: fixed schedule (the monotone curve) ==="
timeout 2400 python scripts/eval_bitstream.py \
  --model-dir runs/r5_rate_control/fixed_ft/models_ckpt \
  --skip-mode zero --rate-mode fixed --synthetic 32 --synthetic-rich --seed 7 \
  --bpps $SWEEP_BPPS \
  --out runs/r5_rate_control/fixed_sweep.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_rate_control/fixed_sweep.log

echo "=== [4/5] 10-point sweep: faithful schedule (the anti-monotone record) ==="
timeout 2400 python scripts/eval_bitstream.py \
  --model-dir runs/r5_base/models_ckpt \
  --skip-mode zero --rate-mode reference --synthetic 32 --synthetic-rich --seed 7 \
  --bpps $SWEEP_BPPS \
  --out runs/r5_rate_control/reference_sweep.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_rate_control/reference_sweep.log

echo "=== [5/5] ceiling: r5_base with quantization bypassed ==="
timeout 1800 python scripts/eval_bitstream.py \
  --model-dir runs/r5_base/models_ckpt \
  --skip-mode zero --quant-bypass --synthetic 32 --synthetic-rich --seed 7 \
  --bpps 0.1 1.0 2.0 \
  --out runs/r5_rate_control/base_ceiling.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_rate_control/base_ceiling.log

echo "=== steps 2-5 done ==="
