#!/bin/bash
# One-command TPU measurement chain (round 5).
# TOOLCHAIN MOVED THIS ROUND (jax 0.8 -> 0.9.0, libtpu 0.0.34): per
# DESIGN §14 / VERDICT r4 item 8, the headline may only be quoted next
# to re-run probe results — the probe legs below are not optional.
# Run from /root/repo with no PYTHONPATH. Each leg is independently
# bounded; the compile cache (/root/.cache/jax_fpsg) makes reruns cheap
# (first compiles under the new toolchain are slow — minutes per graph).
set -x
cd /root/repo
python -c "import jax, jaxlib; print('toolchain: jax', jax.__version__, 'jaxlib', jaxlib.__version__)"
echo "=== headline (bench.py; on-device corpus preamble) ==="
timeout 3600 python bench.py 2>&1 | tail -5
echo "=== toolchain re-probes (DESIGN §14: re-check rejected alternatives) ==="
timeout 3600 python benchmarks/conv_probe.py --bwd 2>&1 | tail -12
timeout 3600 python benchmarks/winograd_probe.py 2>&1 | tail -8
timeout 3600 python bench.py --fused-conv --steps 10 2>&1 | tail -3
echo "=== dgcnn backbone headline (VERDICT r4 item 1) ==="
timeout 5400 python bench.py --pc-backbone dgcnn --steps 10 2>&1 | tail -5
echo "=== emd training cost (VERDICT r4 item 1) ==="
timeout 5400 python bench.py --pc-dist emd --steps 10 2>&1 | tail -5
echo "=== step trace: pointnet + dgcnn ==="
timeout 3600 python benchmarks/step_trace.py --out /tmp/step_trace 2>&1 | tail -3
timeout 3600 python benchmarks/step_trace.py --pc-backbone dgcnn --out /tmp/step_trace_dgcnn 2>&1 | tail -3
python benchmarks/trace_report.py /tmp/step_trace_dgcnn --by source | head -30
echo "=== HTTP serving A/B/A/B under concurrent clients ==="
timeout 4800 python benchmarks/http_bench.py --clients 32 --per-client 8 --ab-rounds 2 2>&1 | tail -6
echo "=== export artifacts execute on the real chip (base + int8) ==="
timeout 1800 python benchmarks/export_chip_check.py 2>&1 | tail -3
echo "=== single-chip N boundary (sp motivation, VERDICT r4 item 5) ==="
SP_FULL_STEP_TPU=1 timeout 3600 python benchmarks/sp_full_step.py --probe-boundary --img 224 --s 32 2>&1 | tail -3
echo "=== DONE ==="
