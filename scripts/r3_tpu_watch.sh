#!/bin/bash
# Poll the TPU relay; when it answers, run the one-shot round-3 measurement
# pass (scripts/r3_measure_all.sh). Only one process may hold the TPU tunnel,
# so the probe and the pass are strictly sequential within this script.
set -u
cd "$(dirname "$0")/.."
for attempt in $(seq 1 200); do
  echo "probe $attempt $(date -u +%H:%M:%S)"
  if timeout 180 python -c "import jax; assert jax.default_backend() != 'cpu'; x = jax.numpy.ones((8,)); print('tpu ok', float(x.sum()))"; then
    echo "relay healthy at $(date -u +%H:%M:%S); running measurement pass"
    bash scripts/r3_measure_all.sh
    exit 0
  fi
  sleep 120
done
echo "relay never came back"
exit 1
