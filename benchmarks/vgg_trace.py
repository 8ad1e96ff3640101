#!/usr/bin/env python
"""Trace VGG fwd+bwd on TPU and print the top ops by device time.

Writes a jax.profiler trace, then parses the perfetto trace.json.gz for
TensorCore op durations — the data behind VGG optimization decisions.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def trace_and_parse(fn, args, out_dir, steps=3):
    for _ in range(2):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    jax.profiler.stop_trace()

    traces = glob.glob(
        os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not traces:
        print("no trace written"); return
    path = max(traces, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    # device-track complete events, grouped by op name
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "Tensor" not in pname:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        durs[name] += dur
        counts[name] += 1
        total += dur
    print(f"\ntrace: {path}\ntotal device op time: {total / steps:.2f} ms/step "
          f"({len(durs)} distinct ops)")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {d / steps:8.3f} ms  x{counts[name] // steps:<4d} {name[:110]}")


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from fpsg_tpu.nn.vgg import VGG16BN

    dt = jnp.bfloat16
    S, IMG = 33, 224
    vgg = VGG16BN(dtype=dt)
    x = jax.random.normal(jax.random.PRNGKey(0), (S, IMG, IMG, 3))
    v = vgg.init(jax.random.PRNGKey(1), x, True)

    @jax.jit
    def fwdbwd(params, batch_stats, x):
        def f(p):
            out, _ = vgg.apply({"params": p, "batch_stats": batch_stats},
                               x, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.value_and_grad(f)(params)

    trace_and_parse(fwdbwd, (v["params"], v["batch_stats"], x),
                    "/tmp/vgg_trace")


if __name__ == "__main__":
    main()
