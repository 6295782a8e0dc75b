#!/bin/bash
# One-shot round-3 TPU measurement pass (run when the relay is healthy).
# Sequential -- only one process may hold the TPU tunnel.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
echo "=== bench ($(date -u +%H:%M:%S)) ==="
timeout 900 python -u bench.py 2>runs/r3_bench.stderr | tee runs/r3_bench.json
echo "=== selftest ($(date -u +%H:%M:%S)) ==="
timeout 900 python -u scripts/tpu_selftest.py 2>&1 | tee runs/tpu_selftest_r3.log
echo "=== perf experiments I/J ($(date -u +%H:%M:%S)) ==="
timeout 900 python -u scripts/r3_perf_experiments.py 2>&1 | tee runs/r3_perf_experiments.log
echo "=== xla flag sweep (experiment E) ($(date -u +%H:%M:%S)) ==="
timeout 1800 python -u scripts/r3_xla_flag_sweep.py 2>&1 | tee runs/r3_xla_flag_sweep.log
echo "=== done ($(date -u +%H:%M:%S)) ==="
