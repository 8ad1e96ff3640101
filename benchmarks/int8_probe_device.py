"""int8 vs bf16 MXU rate, measured with ON-DEVICE loops (one dispatch).

benchmarks/int8_probe.py times per-dispatch calls, which through the axon
tunnel + a busy host measures dispatch latency, not the MXU (a 4096^3
bf16 matmul "measured" 39 TF/s there vs ~130 in the fused train step).
Here each config runs a lax.fori_loop of data-DEPENDENT iterations
(output feeds the next input, int8 path requantizes with a shift) inside
a single jit — pure device rate, no per-iteration host involvement.

Run on TPU:  python benchmarks/int8_probe_device.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 50


def _sync(r):
    leaf = jax.tree_util.tree_leaves(r)[0]
    jax.device_get(leaf[(0,) * leaf.ndim])


def timeit_loop(fn, *args, n=3) -> float:
    """Median of n runs of the fori_loop jit; returns ms per ITERATION."""
    r = fn(*args)
    _sync(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args)
        _sync(r)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / ITERS * 1e3


CONV_SHAPES = [  # (B, H, W, C) square in/out so output can feed back
    (32, 224, 224, 64),
    (32, 112, 112, 128),
    (32, 56, 56, 256),
    (32, 28, 28, 512),
    (32, 14, 14, 512),
    (65, 112, 112, 128),   # train-step packed block-1 site
]
MM_SHAPES = [(4096, 4096), (2048, 2048)]


def conv(x, w, acc):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )


def loop_bf16_conv(x, w):
    def body(_, a):
        y = conv(a, w, jnp.float32)
        return (y * 0.25).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, ITERS, body, x)


def loop_int8_conv(x, w):
    def body(_, a):
        y = conv(a, w, jnp.int32)
        return jax.lax.shift_right_arithmetic(
            jnp.clip(y, -(2 ** 14), 2 ** 14 - 1), 7).astype(jnp.int8)

    return jax.lax.fori_loop(0, ITERS, body, x)


def loop_bf16_mm(x, w):
    def body(_, a):
        y = jnp.dot(a, w, preferred_element_type=jnp.float32)
        return (y * 0.25).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, ITERS, body, x)


def loop_int8_mm(x, w):
    def body(_, a):
        y = jnp.dot(a, w, preferred_element_type=jnp.int32)
        return jax.lax.shift_right_arithmetic(
            jnp.clip(y, -(2 ** 14), 2 ** 14 - 1), 7).astype(jnp.int8)

    return jax.lax.fori_loop(0, ITERS, body, x)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
    except Exception:
        pass
    key = jax.random.PRNGKey(0)
    print(f"on-device fori_loop, {ITERS} data-dependent iters/dispatch")
    print("| site | tf/top | bf16 ms | bf16 TF/s | int8 ms | int8 TOP/s "
          "| int8/bf16 |")
    print("|---|---|---|---|---|---|---|")
    for (b, h, w, c) in CONV_SHAPES:
        xf = (jax.random.normal(key, (b, h, w, c)) / 8).astype(jnp.bfloat16)
        wf = (jax.random.normal(jax.random.fold_in(key, 1),
                                (3, 3, c, c)) / 24).astype(jnp.bfloat16)
        tf = 2 * b * h * w * 9 * c * c / 1e12
        t_bf = timeit_loop(jax.jit(loop_bf16_conv), xf, wf)
        xi = (xf.astype(jnp.float32) * 64).astype(jnp.int8)
        wi = (wf.astype(jnp.float32) * 64).astype(jnp.int8)
        try:
            t_i8 = timeit_loop(jax.jit(loop_int8_conv), xi, wi)
            i8 = f"{t_i8:.2f} | {tf / t_i8 * 1e3:.1f} | {t_bf / t_i8:.2f}x"
        except Exception as e:
            i8 = f"FAIL ({type(e).__name__}) | - | -"
        print(f"| conv {b}x{h}x{w}x{c} | {tf:.3f} | {t_bf:.2f} "
              f"| {tf / t_bf * 1e3:.1f} | {i8} |")
    for (m, k) in MM_SHAPES:
        af = (jax.random.normal(key, (m, k)) / 8).astype(jnp.bfloat16)
        bf = (jax.random.normal(jax.random.fold_in(key, 2),
                                (k, m)) / 8).astype(jnp.bfloat16)
        tf = 2 * m * k * m / 1e12
        t_bf = timeit_loop(jax.jit(loop_bf16_mm), af, bf)
        ai = (af.astype(jnp.float32) * 16).astype(jnp.int8)
        bi = (bf.astype(jnp.float32) * 16).astype(jnp.int8)
        try:
            t_i8 = timeit_loop(jax.jit(loop_int8_mm), ai, bi)
            i8 = f"{t_i8:.2f} | {tf / t_i8 * 1e3:.1f} | {t_bf / t_i8:.2f}x"
        except Exception as e:
            i8 = f"FAIL ({type(e).__name__}) | - | -"
        print(f"| mm {m}x{k}x{m} | {tf:.3f} | {t_bf:.2f} "
              f"| {tf / t_bf * 1e3:.1f} | {i8} |")


if __name__ == "__main__":
    main()
