#!/bin/bash
# One-command TPU measurement chain (round 3k: serving quant + HTTP).
# Run from /root/repo with no PYTHONPATH. Each leg is independently
# bounded; the compile cache (/root/.cache/jax_fpsg) makes reruns cheap.
set -x
cd /root/repo
echo "=== headline (bench.py, cached compiles) ==="
timeout 3600 python bench.py 2>&1 | tail -5
echo "=== serving int8 A/B (keyed hot path + on-device encoder loop) ==="
timeout 2400 python benchmarks/serve_bench.py --int8 --dtypes bf16 --batches 8 32 --steps 20 2>&1 | tail -5
echo "=== HTTP serving under concurrent single-image clients ==="
timeout 2400 python benchmarks/http_bench.py --clients 32 --per-client 8 2>&1 | tail -5
echo "=== export artifacts execute on the real chip (base + int8) ==="
timeout 1800 python benchmarks/export_chip_check.py 2>&1 | tail -3
echo "=== DONE ==="
