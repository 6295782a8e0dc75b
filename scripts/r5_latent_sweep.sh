#!/bin/bash
# Round-5 latent-capacity sweep (redesigned after the first attempt OOMed).
#
# Why: mask conditioning measured a null (+0.03 dB) and quantization bypass
# costs ~0 dB, so the storable codec is latent-information-bound
# (runs/r5_mask_cond/RUN.md). base_latent_dim is the capacity lever.
#
# Why these sizes: the reference architecture's latent projections are dense
# over the flattened 16x16x512 encoder tail (131072 x latent), so parameter
# count -- and Adam state -- scales linearly in latent dim: dim512 trains in
# ~13 GB of the v5e's 16 GB HBM, and the first attempt at dim1024/dim2048
# hit RESOURCE_EXHAUSTED during compile (fp32 params + 2 Adam moments +
# grads ~= 4x params: dim1024 needs ~19 GB). 384/512/768 is the widest
# single-chip-trainable span; each twin uses corpus 1024 + batch 8 (memory
# headroom for dim768) so the THREE runs are matched in everything but
# capacity -- including total sample count (1024 x 40 = 2048 x 20).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

TRAIN="--synthetic 1024 --synthetic-rich --vgg-weights random --save-mode host --batch-size 8"
BPPS="0.1 1.0 2.0"
mkdir -p runs/r5_latent_sweep

for DIM in 384 512 768; do
  echo "=== train latent${DIM} twin ==="
  timeout 5400 python scripts/train_gan.py $TRAIN --epochs 40 --no-resume --no-fine-tune \
    --skip-mode zero --quant-grad-mode ste --rate-mode fixed --checkpoint-every 999 \
    --branch-recon-weight 0.2 --base-latent-dim $DIM \
    --results-dir runs/r5_latent_sweep/dim${DIM}/results \
    --model-dir runs/r5_latent_sweep/dim${DIM}/models_ckpt \
    2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_latent_sweep/dim${DIM}_train.log

  echo "=== eval latent${DIM} (bytes->image) ==="
  timeout 1800 python scripts/eval_bitstream.py \
    --model-dir runs/r5_latent_sweep/dim${DIM}/models_ckpt \
    --skip-mode zero --rate-mode fixed --base-latent-dim $DIM \
    --synthetic 32 --synthetic-rich --seed 7 --bpps $BPPS \
    --out runs/r5_latent_sweep/dim${DIM}_eval.json \
    2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_latent_sweep/dim${DIM}_eval.log
done

echo "=== ceiling eval on the largest twin ==="
timeout 1800 python scripts/eval_bitstream.py \
  --model-dir runs/r5_latent_sweep/dim768/models_ckpt \
  --skip-mode zero --rate-mode fixed --base-latent-dim 768 --quant-bypass \
  --synthetic 32 --synthetic-rich --seed 7 --bpps $BPPS \
  --out runs/r5_latent_sweep/dim768_ceiling.json \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_latent_sweep/dim768_ceiling.log

echo "=== latent sweep done ==="
