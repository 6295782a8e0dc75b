#!/bin/bash
# Round-5 final TPU queue, gated on relay health (the tunnel drops out for
# ~25-minute stretches; see r3_tpu_watch.sh which established the pattern).
# Order: codec shootout re-run (round-4 verdict item 5) -> latent-capacity
# sweep (item 2b) -> bench refresh is run separately once the chip is idle.
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

echo "=== shootout re-run ==="
timeout 1800 python scripts/codec_shootout.py --synthetic 16 --synthetic-rich --seed 0 \
  --model-dir runs/r5_faithful/models_ckpt --gan-skip-mode encoder \
  --skipfree-dir runs/r5_zero_fixed/models_ckpt --skipfree-skip-mode zero --skipfree-rate-mode fixed \
  --ae-dir runs/ae_ref/model \
  --out runs/codec_shootout/codec_shootout_r5.json --plot runs/codec_shootout/codec_shootout_r5.png \
  2>&1 | grep --line-buffered -v "^WARNING" | tee runs/codec_shootout/stdout_r5.log

echo "=== latent-capacity sweep ==="
bash scripts/r5_latent_sweep.sh

echo "=== final queue done ==="
