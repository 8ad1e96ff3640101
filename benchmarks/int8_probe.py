"""Probe: int8 conv/matmul rate vs bf16 at the VGG serving shapes.

Decision gate for a quantized serving path: the v5e MXU does s8 x s8 ->
s32 at ~2x the bf16 rate (394 vs 197 TOPS peak). Serving through the
dev tunnel is link-bound (BASELINE.md round 3i), but on a real TPU host
the generate call is compute-bound and VGG-dominated — IF XLA actually
lowers int8 convs to the MXU's int8 path at our shapes, a weight+activation
int8 VGG is worth building (serve_quant). If the measured int8 rate is
<= bf16, it is not.

Run on TPU:  python benchmarks/int8_probe.py
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


# Serving-shaped (batch 32 query VGG) conv sites + one big matmul.
CONV_SHAPES = [  # (B, H, W, Cin, Cout)
    (32, 224, 224, 64, 64),
    (32, 112, 112, 128, 128),
    (32, 56, 56, 256, 256),
    (32, 28, 28, 512, 512),
    (32, 14, 14, 512, 512),
]
MM_SHAPES = [(4096, 4096, 4096), (8192, 2048, 2048)]


def conv(x, w, acc):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
    except Exception:
        pass
    key = jax.random.PRNGKey(0)
    print("| site | tf/top | bf16 ms | bf16 TF/s | int8 ms | int8 TOP/s |")
    print("|---|---|---|---|---|---|")
    for (b, h, w, ci, co) in CONV_SHAPES:
        xf = (jax.random.normal(key, (b, h, w, ci)) / 8)
        wf = (jax.random.normal(jax.random.fold_in(key, 1),
                                (3, 3, ci, co)) / 24)
        tf = 2 * b * h * w * 9 * ci * co / 1e12
        f_bf = jax.jit(lambda a, k: conv(a.astype(jnp.bfloat16),
                                         k.astype(jnp.bfloat16),
                                         jnp.float32))
        t_bf = timeit(f_bf, xf, wf)
        xi = (xf * 64).astype(jnp.int8)
        wi = (wf * 64).astype(jnp.int8)
        f_i8 = jax.jit(lambda a, k: conv(a, k, jnp.int32))
        try:
            t_i8 = timeit(f_i8, xi, wi)
            i8 = f"{t_i8:.2f} | {tf / t_i8 * 1e3:.1f}"
        except Exception as e:  # lowering may reject int8 convs
            i8 = f"FAIL ({type(e).__name__}) | -"
        print(f"| conv {b}x{h}x{w}x{ci}->{co} | {tf:.3f} | {t_bf:.2f} "
              f"| {tf / t_bf * 1e3:.1f} | {i8} |")
    for (m, k, n) in MM_SHAPES:
        af = jax.random.normal(key, (m, k)) / 8
        bf = jax.random.normal(jax.random.fold_in(key, 2), (k, n)) / 8
        tf = 2 * m * k * n / 1e12
        f_bf = jax.jit(lambda a, b_: jnp.dot(
            a.astype(jnp.bfloat16), b_.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32))
        t_bf = timeit(f_bf, af, bf)
        ai = (af * 16).astype(jnp.int8)
        bi = (bf * 16).astype(jnp.int8)
        f_i8 = jax.jit(lambda a, b_: jnp.dot(
            a, b_, preferred_element_type=jnp.int32))
        try:
            t_i8 = timeit(f_i8, ai, bi)
            i8 = f"{t_i8:.2f} | {tf / t_i8 * 1e3:.1f}"
        except Exception as e:
            i8 = f"FAIL ({type(e).__name__}) | -"
        print(f"| mm {m}x{k}x{n} | {tf:.3f} | {t_bf:.2f} "
              f"| {tf / t_bf * 1e3:.1f} | {i8} |")


if __name__ == "__main__":
    main()
