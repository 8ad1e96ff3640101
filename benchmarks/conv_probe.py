"""Probe: Pallas conv3x3 vs the XLA conv at the VGG production shapes.

Decision gate for the fused conv+BN project (DESIGN.md §11 follow-on):
only if the Pallas forward matches/beats XLA's measured conv rate
(~135 TF/s on the unpacked blocks, r3 trace) is it worth building the
fused prologue-affine / epilogue-stats conv family with its dgrad and
wgrad kernels.

Run on TPU:  python benchmarks/conv_probe.py [--sweep]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(r):
    # Drain the queue with a SCALAR device→host read: block_until_ready
    # lies through the axon tunnel (CLAUDE.md), and device_get of the
    # full tensor measures tunnel transfer bandwidth (~seconds for a
    # 400 MB activation), not device time.
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


SHAPES = [  # (B, H, W, Cin, Cout)  — r3-trace VGG conv sites
    (65, 224, 112, 128, 128),   # block-1 packed conv1_2 equivalent
    (65, 112, 112, 128, 128),   # conv2_x
    (65, 56, 56, 256, 256),     # conv3_x
    (65, 28, 28, 512, 512),     # conv4_x
    (65, 14, 14, 512, 512),     # conv5_x
]


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
    except Exception:
        pass
    from fpsg_tpu.ops.conv3x3 import (
        _row_tile, conv3x3_oracle, conv3x3_same)

    sweep = "--sweep" in sys.argv
    bwd = "--bwd" in sys.argv
    key = jax.random.PRNGKey(0)
    print("| shape (B,H,W,Ci,Co) | tf | XLA ms | XLA TF/s |"
          " Pallas ms | Pallas TF/s | th |")
    print("|---|---|---|---|---|---|---|")
    for (b, h, w, ci, co) in SHAPES:
        x = (jax.random.normal(key, (b, h, w, ci)) / 8).astype(jnp.bfloat16)
        wt = (jax.random.normal(jax.random.fold_in(key, 1),
                                (3, 3, ci, co)) / 24).astype(jnp.bfloat16)
        tf = 2 * b * h * w * 9 * ci * co / 1e12
        f_x = jax.jit(conv3x3_oracle)
        t_x = timeit(f_x, x, wt)
        ths = ([t for t in (32, 28, 16, 14, 8, 4, 2) if h % t == 0]
               if sweep else [_row_tile(h, w, ci, co)])
        best = (1e9, None)
        for th in ths:
            f_p = jax.jit(lambda a, k, th=th: conv3x3_same(
                a, k, interpret=False, row_tile=th))
            try:
                t_p = timeit(f_p, x, wt)
            except Exception as e:
                print(f"|  th={th} failed: {str(e)[:80]} |")
                continue
            if sweep:
                print(f"|  th={th} | | | | {t_p:.2f} | {tf/t_p*1e3:.0f} | |")
            best = min(best, (t_p, th))
        t_p, th = best
        # numerical sanity at the probe shapes
        err = float(jnp.max(jnp.abs(
            f_x(x, wt).astype(jnp.float32)
            - conv3x3_same(x, wt, interpret=False,
                           row_tile=th).astype(jnp.float32))))
        print(f"| {(b,h,w,ci,co)} | {tf*1e3:.1f}G | {t_x:.2f} "
              f"| {tf/t_x*1e3:.0f} | {t_p:.2f} | {tf/t_p*1e3:.0f} "
              f"| {th} (err {err:.1e}) |")

        if not bwd:
            continue
        # --- backward kernels at the same shape (3x the fwd FLOPs
        # total: dgrad + wgrad each equal the fwd count) ---------------
        from fpsg_tpu.ops.conv3x3 import (
            _combined_row_tile, _conv_cbwd_pallas, _conv_dgrad_pallas,
            _conv_wgrad_pallas, _rot180_swap)

        wk = wt.reshape(9 * ci, co)
        wkr = _rot180_swap(wk, ci, co)
        gy = (jax.random.normal(jax.random.fold_in(key, 2),
                                (b, h, w, co)) / 8).astype(jnp.bfloat16)
        y = f_x(x, wt)
        kin = jnp.ones((ci,), jnp.float32)
        bz = jnp.zeros((ci,), jnp.float32)
        sz = jnp.zeros((co,), jnp.float32)

        def xla_bwd(x, wt, gy):
            # pure-bf16 conv (what the real step's VJP runs): the oracle's
            # preferred_element_type=f32 + astype(bf16) would hand a f32
            # cotangent to a bf16 conv transpose, which lax rejects.
            def f(a, k):
                return jax.lax.conv_general_dilated(
                    a, k, window_strides=(1, 1), padding="SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            _, vjp = jax.vjp(f, x, wt)
            return vjp(gy)

        t_xb = timeit(jax.jit(xla_bwd), x, wt, gy)
        f_dg = jax.jit(lambda gy, y, x: _conv_dgrad_pallas(
            gy, y, x, kin, bz, wkr, sz, sz, sz, True, True, False))
        f_wg = jax.jit(lambda x, gy, y: _conv_wgrad_pallas(
            x, kin, bz, gy, y, sz, sz, sz, True, True, False))
        t_dg = timeit(f_dg, gy, y, x)
        t_wg = timeit(f_wg, x, gy, y)
        line = (f"|   bwd | {2*tf*1e3:.1f}G | {t_xb:.2f} "
                f"| {2*tf/t_xb*1e3:.0f} | dg {t_dg:.2f} + wg {t_wg:.2f} "
                f"| {tf/t_dg*1e3:.0f}/{tf/t_wg*1e3:.0f} |")
        cth = _combined_row_tile(h, w, ci, co)
        if cth is not None:
            f_cb = jax.jit(lambda gy, y, x: _conv_cbwd_pallas(
                gy, y, x, kin, bz, wkr, sz, sz, sz, True, True, False,
                cth))
            t_cb = timeit(f_cb, gy, y, x)
            line += f" comb {t_cb:.2f} ({2*tf/t_cb*1e3:.0f} TF/s, th={cth}) |"
        print(line)


if __name__ == "__main__":
    main()
