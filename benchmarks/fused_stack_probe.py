#!/usr/bin/env python
"""Probe: fused decoder mid-layer backward dW tilings at production shapes.

Measured history (v5e, C=Nn=4, R=1536, bf16 — see fused_stack._dw_tiles):
full-width dW wins for the (769->384) layer (0.36 vs 0.40 ms bwd), loses
or refuses to compile for (1539->769); a fully-combined dgrad+wgrad
one-kernel backward was rejected (0.49 vs 0.36 ms where it fit, scoped
VMEM >16 MB on the wider layer).

Run on TPU:  python benchmarks/fused_stack_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, n=20) -> float:
    r = fn(*args)
    _sync(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fpsg")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from fpsg_tpu.nn import fused_stack as fs

    C, NN, R, P = 4, 4, 1536, 128
    layers = [(1539, 769), (769, 384)]
    key = jax.random.PRNGKey(0)
    print(f"shapes: C={C} Nn={NN} R={R} P={P}; dtype bf16")
    for din, dout in layers:
        ks = jax.random.split(key, 6)
        yp = jax.random.normal(ks[0], (C, NN, R, din), jnp.bfloat16)
        k = jax.random.normal(ks[1], (C, NN, din), jnp.float32) * 0.1 + 1.0
        b = jax.random.normal(ks[2], (C, NN, din), jnp.float32) * 0.1
        w = jax.random.normal(ks[3], (C, NN, din, dout), jnp.bfloat16) \
            * (1.0 / din) ** 0.5
        s = jax.random.normal(ks[4], (C, NN, dout), jnp.float32) * 0.1

        def loss(yp, k, b, w, s):
            y, zs, zq = fs.fused_mid_layer(yp, k, b, w, s, True, P)
            return (jnp.sum(y.astype(jnp.float32)) + jnp.sum(zs)
                    + jnp.sum(zq * 0.5))

        fwd = jax.jit(lambda *a: fs.fused_mid_layer(*a, True, P))
        t_fwd = timeit(fwd, yp, k, b, w, s)
        gflop_bwd = 2 * 2 * C * NN * R * din * dout / 1e9
        auto = fs._dw_tiles(R, P, din, dout, 2)
        print(f"({din:4d}->{dout:4d}) fwd {t_fwd:6.2f} ms  auto={auto}")

        def run(tag, dw_override):
            fs._DW_OVERRIDE = dw_override
            fs._fused_mid_bwd_impl.clear_cache()  # knob read at trace time
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            try:
                t = timeit(g, yp, k, b, w, s)
            except Exception as e:
                print(f"  {tag:24s} FAILED: {str(e)[:90]}")
                return
            print(f"  {tag:24s} bwd {t - t_fwd:6.2f} ms "
                  f"({gflop_bwd / (t - t_fwd):6.1f} TF/s)")

        run("auto", None)
        run("td=256 tr=256", (min(256, dout), 256))
        run(f"td={dout} tr=128", (dout, 128))
        fs._DW_OVERRIDE = None
        fs._fused_mid_bwd_impl.clear_cache()


if __name__ == "__main__":
    main()
