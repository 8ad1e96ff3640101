"""Micro-benchmarks for the TPU-native ops (oracle vs Pallas).

Run on TPU:  python benchmarks/ops_bench.py
Prints a markdown table; results recorded in BASELINE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(x):
    jax.device_get(jax.tree.leaves(x)[0])


def timeit(fn, *args, n=10) -> float:
    r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
    except Exception:
        pass
    from fpsg_tpu.ops.chamfer import chamfer_distance
    from fpsg_tpu.ops.emd import sinkhorn_emd
    from fpsg_tpu.ops.knn import knn_indices

    key = jax.random.PRNGKey(0)
    rows = []

    for b, n in [(8, 2048), (2, 8192)]:
        x = jax.random.normal(key, (b, n, 3))
        y = jax.random.normal(jax.random.fold_in(key, 1), (b, n, 3))
        for impl in ["oracle", "pallas"]:
            f = jax.jit(lambda a, c, i=impl: chamfer_distance(a, c, impl=i).sum())
            rows.append((f"chamfer fwd B={b} N={n}", impl, timeit(f, x, y)))
            g = jax.jit(jax.grad(
                lambda a, i=impl: chamfer_distance(a, y, impl=i).sum()))
            rows.append((f"chamfer fwd+bwd B={b} N={n}", impl, timeit(g, x)))

    x = jax.random.normal(key, (8, 2048, 3))
    y = jax.random.normal(jax.random.fold_in(key, 1), (8, 2048, 3))
    for impl in ["oracle", "pallas"]:
        f = jax.jit(lambda a, c, i=impl: sinkhorn_emd(a, c, n_iters=100, impl=i).sum())
        rows.append(("sinkhorn-emd 100it B=8 N=2048", impl, timeit(f, x, y, n=3)))

    for n in [2048, 8192]:
        x = jax.random.normal(key, (2, n, 3))
        for impl in ["oracle", "pallas"]:
            f = jax.jit(lambda a, i=impl: knn_indices(a, k=20, impl=i))
            rows.append((f"knn k=20 B=2 N={n}", impl, timeit(f, x)))

    print("| op | impl | ms |")
    print("|---|---|---|")
    for name, impl, ms in rows:
        print(f"| {name} | {impl} | {ms:.2f} |")


if __name__ == "__main__":
    main()
