#!/usr/bin/env python
"""Aggregate a jax.profiler perfetto trace by source attribution.

Groups TensorCore op time by the `source` (file:line) and `tf_op` metadata
XLA attaches to each HLO op, and reports achieved bytes/s and FLOP/s per
group — the view that decides which module to optimize next.

Usage: python benchmarks/trace_report.py /tmp/step_trace [--steps 3] [--by shape]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def load(trace_dir):
    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        return json.load(f), path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--by", default="source",
                    choices=["source", "shape", "category", "tf_op"])
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    data, path = load(args.trace_dir)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")

    rows = defaultdict(lambda: [0.0, 0, 0.0, 0.0])  # ms, count, GB, GFLOP
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "Tensor" not in pname:
            continue
        a = ev.get("args") or {}
        ln = a.get("long_name", "")
        # skip the enclosing jit region event (it spans everything)
        if ev.get("name", "").startswith("jit_") or not a:
            continue
        if args.by == "source":
            key = a.get("source", "?")
            if key == "?":
                # fall back to category for unattributed ops
                key = "<no-src> " + a.get("hlo_category", ev.get("name", "?"))
        elif args.by == "shape":
            key = a.get("shape_with_layout", "?")[:90]
        elif args.by == "category":
            key = a.get("hlo_category", "?")
        else:
            key = (a.get("tf_op", "?")).split("/")[-1][:100]
        dur = ev.get("dur", 0) / 1e3
        r = rows[key]
        r[0] += dur
        r[1] += 1
        r[2] += float(a.get("bytes_accessed", 0)) / 1e9
        r[3] += float(a.get("model_flops", 0) or 0) / 1e9
        total += dur
    print(f"trace: {path}")
    print(f"total device op time: {total / args.steps:.2f} ms/step")
    print(f"{'ms/step':>8} {'x':>5} {'GB/s':>7} {'TFLOP/s':>8}  {args.by}")
    for key, (ms, n, gb, gf) in sorted(rows.items(), key=lambda kv: -kv[1][0])[: args.top]:
        bw = gb / (ms / 1e3) if ms else 0.0
        fl = gf / (ms / 1e3) / 1e3 if ms else 0.0
        print(f"{ms / args.steps:8.3f} {n // args.steps:5d} {bw:7.0f} {fl:8.2f}  {key}")


if __name__ == "__main__":
    main()
