#!/usr/bin/env python
"""Probe: do the decoder's odd matmul shapes (K=1539, N=769) leave MXU
throughput on the table vs clean 128-multiples?

The r3 trace has the decoder node einsums at ~81 TF/s and records a lone
(67584x1539x769) matmul at 84 TF/s as "the XLA ceiling for these shapes"
(BASELINE.md breakdown). 1539 pads to 13 sublane tiles (92.5% useful)
and 769 to 7 lane tiles (85.8%) — if padding is what's binding, a
1536/768 split (big clean matmul + rank-3 correction) should run ~1.5x
faster. This script measures that hypothesis directly.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    cases = []

    # lone big matmuls, odd vs clean vs padded
    for (m, k, n) in [
        (67584, 1539, 769), (67584, 1536, 768), (67584, 1664, 896),
        (67584, 1539, 1539), (67584, 1536, 1536),
        (4224, 1539, 1539), (4224, 1536, 1536),
    ]:
        ka, kb = jax.random.split(jax.random.fold_in(key, m * k * n))
        a = jax.random.normal(ka, (m, k), jnp.float32).astype(dt)
        b = jax.random.normal(kb, (k, n), jnp.float32).astype(dt)
        f = jax.jit(lambda a, b: a @ b)
        t = timeit(f, a, b)
        tf = 2 * m * k * n / t / 1e12
        cases.append((f"lone {m}x{k}x{n}", t * 1e3, tf))

    # grouped (C,Nn) einsum at decoder shapes, odd vs clean
    for (k, n) in [(1539, 1539), (1536, 1536), (1539, 769), (1536, 768)]:
        ka, kb = jax.random.split(jax.random.fold_in(key, k * n + 1))
        x = jax.random.normal(ka, (33, 4, 4, 128, k), jnp.float32).astype(dt)
        w = jax.random.normal(kb, (4, 4, k, n), jnp.float32).astype(dt)
        f = jax.jit(functools.partial(jnp.einsum, "bcnpk,cnkd->bcnpd"))
        t = timeit(f, x, w)
        tf = 2 * 33 * 4 * 4 * 128 * k * n / t / 1e12
        cases.append((f"grouped einsum K={k} N={n}", t * 1e3, tf))

    # split formulation equivalent to the full 1539x769 product: clean
    # 1536x768 main + rank-3 K-tail + the 769th output column
    ka, kb, kc, kd = jax.random.split(key, 4)
    a = jax.random.normal(ka, (67584, 1539), jnp.float32).astype(dt)
    w_main = jax.random.normal(kb, (1536, 768), jnp.float32).astype(dt)
    w_tail = jax.random.normal(kc, (3, 768), jnp.float32).astype(dt)
    w_last = jax.random.normal(kd, (1539, 1), jnp.float32).astype(dt)

    @jax.jit
    def split(a, w_main, w_tail, w_last):
        main = a[:, :1536] @ w_main + a[:, 1536:] @ w_tail
        return jnp.concatenate([main, a @ w_last], axis=1)

    t = timeit(split, a, w_main, w_tail, w_last)
    tf = 2 * 67584 * 1539 * 769 / t / 1e12  # same logical work as the odd case
    cases.append(("split 1536+3/768+1 (logical 1539x769)", t * 1e3, tf))

    for name, ms, tf in cases:
        print(f"{name:45s} {ms:8.3f} ms  {tf:7.1f} TF/s")


if __name__ == "__main__":
    sys.exit(main())
