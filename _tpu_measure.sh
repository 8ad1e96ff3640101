#!/bin/bash
# One-command TPU measurement chain (round 4: dgcnn backbone + emd
# training cost + serving A/B/A/B + sp boundary probe).
# Run from /root/repo with no PYTHONPATH. Each leg is independently
# bounded; the compile cache (/root/.cache/jax_fpsg) makes reruns cheap.
set -x
cd /root/repo
echo "=== headline (bench.py, cached compiles) ==="
timeout 3600 python bench.py 2>&1 | tail -5
echo "=== dgcnn backbone headline (VERDICT r3 item 1) ==="
timeout 5400 python bench.py --pc-backbone dgcnn --steps 10 2>&1 | tail -5
echo "=== emd training cost (VERDICT r3 item 5) ==="
timeout 5400 python bench.py --pc-dist emd --steps 10 2>&1 | tail -5
echo "=== step trace: pointnet + dgcnn ==="
timeout 3600 python benchmarks/step_trace.py --out /tmp/step_trace 2>&1 | tail -3
timeout 3600 python benchmarks/step_trace.py --pc-backbone dgcnn --out /tmp/step_trace_dgcnn 2>&1 | tail -3
python benchmarks/trace_report.py /tmp/step_trace_dgcnn --by source | head -30
echo "=== HTTP serving A/B/A/B under concurrent clients (VERDICT item 4) ==="
timeout 4800 python benchmarks/http_bench.py --clients 32 --per-client 8 --ab-rounds 2 2>&1 | tail -6
echo "=== export artifacts execute on the real chip (base + int8) ==="
timeout 1800 python benchmarks/export_chip_check.py 2>&1 | tail -3
echo "=== single-chip N boundary (sp motivation, VERDICT item 6) ==="
SP_FULL_STEP_TPU=1 timeout 3600 python benchmarks/sp_full_step.py --probe-boundary --img 224 --s 32 2>&1 | tail -3
echo "=== DONE ==="
