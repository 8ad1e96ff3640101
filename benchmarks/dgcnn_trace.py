#!/usr/bin/env python
"""Trace DGCNN encoder fwd+bwd on TPU; per-shape device-time attribution.

The r2 measurement: 383 ms for 64 clouds x 2048 pts, k=20 (vs 6.6 ms for
the PointNet encoder) — this script shows where (kNN extraction vs
gathers vs conv/BN) to drive the fused-EdgeConv work (VERDICT r3 item 4).

Usage: python benchmarks/dgcnn_trace.py [--batch 64] [--pts 2048]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.vgg_trace import trace_and_parse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--pts", type=int, default=2048)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--out", default="/tmp/dgcnn_trace")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from fpsg_tpu.nn.dgcnn import DGCNNFeat

    dgcnn = DGCNNFeat(k=args.k, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (args.batch, args.pts, 3))
    v = dgcnn.init(jax.random.PRNGKey(1), x, True)

    @jax.jit
    def fwdbwd(params, batch_stats, x):
        def f(p):
            out, _ = dgcnn.apply({"params": p, "batch_stats": batch_stats},
                                 x, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.value_and_grad(f)(params)

    trace_and_parse(fwdbwd, (v["params"], v["batch_stats"], x), args.out)


if __name__ == "__main__":
    main()
