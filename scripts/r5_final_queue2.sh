#!/bin/bash
# Round-5 final queue, revision 2. The container reset between sessions
# dropped every gitignored runs/*/models_ckpt/ directory (evidence JSONs and
# logs survived), so the shootout re-run and latent sweep must first
# reproduce the two checkpoints they score. Both recipes are fully seeded
# (seed 42 corpus + init), so the retrains reproduce the committed runs;
# retrain logs go to *_retrain.log so the committed training logs stay
# untouched.
# Order: retrain r5_zero_fixed + r5_faithful -> codec shootout re-run
# (round-4 verdict item 5) -> latent-capacity sweep (item 2b).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

for attempt in $(seq 1 90); do
  echo "probe $attempt $(date -u +%H:%M:%S)"
  if timeout 180 python -c "import jax; assert jax.default_backend() != 'cpu'; x = jax.numpy.ones((8,)); print('tpu ok', float(x.sum()))" 2>/dev/null; then
    break
  fi
  sleep 60
done

TRAIN="--synthetic 2048 --synthetic-rich --vgg-weights random --save-mode host"

if [ ! -d runs/r5_zero_fixed/models_ckpt ]; then
  echo "=== retrain r5_zero_fixed (exact r5_steps6to10.sh step 6 flags) ==="
  timeout 4500 python scripts/train_gan.py $TRAIN --epochs 20 --no-resume --no-fine-tune \
    --skip-mode zero --quant-grad-mode ste --rate-mode fixed --checkpoint-every 999 \
    --branch-recon-weight 0.2 \
    --results-dir runs/r5_zero_fixed/results --model-dir runs/r5_zero_fixed/models_ckpt \
    2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_zero_fixed_retrain.log
fi

if [ ! -d runs/r5_faithful/models_ckpt ]; then
  echo "=== retrain r5_faithful (exact r5_steps6to10.sh step 9 flags) ==="
  timeout 4500 python scripts/train_gan.py \
    --synthetic 2048 --synthetic-rich --save-mode host --no-perceptual \
    --epochs 20 --no-resume --no-fine-tune --checkpoint-every 999 \
    --skip-mode encoder --bn-mode frozen --disc-bn-mode frozen \
    --quant-grad-mode reference --broadcast-quirk \
    --results-dir runs/r5_faithful/results --model-dir runs/r5_faithful/models_ckpt \
    2>&1 | grep --line-buffered -v "^WARNING" | tee runs/r5_faithful_retrain.log
fi

echo "=== shootout re-run ==="
timeout 1800 python scripts/codec_shootout.py --synthetic 16 --synthetic-rich --seed 0 \
  --model-dir runs/r5_faithful/models_ckpt --gan-skip-mode encoder \
  --skipfree-dir runs/r5_zero_fixed/models_ckpt --skipfree-skip-mode zero --skipfree-rate-mode fixed \
  --ae-dir runs/ae_ref/model \
  --out runs/codec_shootout/codec_shootout_r5.json --plot runs/codec_shootout/codec_shootout_r5.png \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/codec_shootout/stdout_r5.log

echo "=== latent-capacity sweep ==="
bash scripts/r5_latent_sweep.sh

echo "=== final queue rev2 done ==="
