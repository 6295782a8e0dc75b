#!/bin/bash
# Round-4 post-training TPU queue: runs the eval/probe/shootout/perf jobs
# back-to-back once the reference-grad training frees the chip.
set -u
cd /root/repo

echo "=== [1/4] eval_bitstream on the reference-grad skip-free checkpoint ==="
timeout 900 python scripts/eval_bitstream.py \
  --model-dir runs/r4_skipfree/reference/models_ckpt --skip-mode zero \
  --synthetic 32 --synthetic-rich --seed 7 \
  --out runs/r4_skipfree/reference_bitstream_eval.json \
  2>&1 | grep -v "^WARNING"

echo "=== [2/4] latent-saliency convergence probe (faithful pole) ==="
timeout 2700 python scripts/r4_ls_probe.py \
  --synthetic 1024 --epochs 12 \
  --out runs/r4_ls_probe/probe.json \
  2>&1 | grep -v "^WARNING" | tee runs/r4_ls_probe_stdout.log

echo "=== [3/4] codec shootout (trained ckpts: skip-free GAN + AE + DCT) ==="
mkdir -p runs/codec_shootout
timeout 1800 python scripts/codec_shootout.py \
  --synthetic 16 --synthetic-rich --seed 7 \
  --model-dir runs/r4_skipfree/ste/models_ckpt --gan-skip-mode zero \
  --skipfree-dir runs/r4_skipfree/ste/models_ckpt \
  --ae-dir runs/ae_ref/model \
  --out runs/codec_shootout/codec_shootout.json \
  --plot runs/codec_shootout/codec_shootout.png \
  2>&1 | grep -v "^WARNING" | tee runs/codec_shootout/stdout.log

echo "=== [4/4] round-4 perf experiments (int8 planar tail) ==="
timeout 1800 python scripts/r4_perf_experiments.py \
  2>&1 | grep -v "^WARNING" | tee runs/r4_perf_experiments.log

echo "=== queue done ==="
