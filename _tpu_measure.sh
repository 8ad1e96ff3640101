#!/bin/bash
# Post-tunnel-recovery measurement chain (round-3b fused BN-pool kernels
# + the fused conv+BN chain). Run from /root/repo with no PYTHONPATH.
set -x
cd /root/repo
echo "=== conv probe (Pallas conv vs XLA at VGG shapes) ==="
timeout 3000 python benchmarks/conv_probe.py --bwd 2>&1 | tail -20
echo "=== bench.py (fused conv ON, default) ==="
timeout 3600 python bench.py 2>&1 | tail -5
echo "=== bench.py (fused conv OFF, A/B) ==="
timeout 3600 python bench.py --no-fused-conv 2>&1 | tail -5
echo "=== bench.py (bf16 Adam moments, A/B) ==="
timeout 3600 python bench.py --bf16-moments 2>&1 | tail -5
echo "=== step_trace ==="
timeout 2400 python benchmarks/step_trace.py 2>&1 | tail -5
echo "=== trace_report by source ==="
timeout 600 python benchmarks/trace_report.py /tmp/step_trace --by source 2>&1 | head -40
echo "=== DONE ==="
