"""Winograd F(2,3) vs XLA direct conv — per-VGG-shape decision probe.

Run on the real chip (no args): times forward and forward+backward for
every unpacked VGG16-bn conv shape of the training step (B=65 images,
blocks 2-5) in bf16, direct ``lax.conv_general_dilated`` vs
``ops/winograd.winograd_conv3x3``. The verdict column drives per-site
integration (a Winograd site must beat the direct conv END-TO-END —
fwd+bwd — since the step always runs both).

Winograd executes 4/9 of the direct MACs in fwd, dgrad AND wgrad, but
materializes 4x-input transformed activations in HBM; small-C layers
are expected to lose on bandwidth, 256/512-ch layers to win on MACs.

Usage:  python benchmarks/winograd_probe.py [--iters 20] [--fwd-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.ops.winograd import winograd_conv3x3

# (name, B, H, W, Ci, Co) — the unpacked VGG16-bn conv sites at the
# headline config's image batch (33 support + 32 query = 65).
SHAPES = [
    ("conv2_1", 65, 112, 112, 64, 128),
    ("conv2_2", 65, 112, 112, 128, 128),
    ("conv3_1", 65, 56, 56, 128, 256),
    ("conv3_2/3", 65, 56, 56, 256, 256),
    ("conv4_1", 65, 28, 28, 256, 512),
    ("conv4_2/3", 65, 28, 28, 512, 512),
    ("conv5_1/2/3", 65, 14, 14, 512, 512),
]


def direct_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _time(fn, args, iters):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][..., :1, :1])  # queue drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][..., :1, :1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}, dtype {dt}")
    hdr = f"{'site':>12} {'dir fwd':>9} {'win fwd':>9}"
    if not args.fwd_only:
        hdr += f" {'dir f+b':>9} {'win f+b':>9} {'verdict':>8}"
    print(hdr)

    for name, b, h, w_, ci, co in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, h, w_, ci)), dt)
        wk = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, dt)
        flops = 2 * b * h * w_ * 9 * ci * co

        f_dir = jax.jit(direct_conv)
        f_win = jax.jit(winograd_conv3x3)
        td = _time(f_dir, (x, wk), args.iters)
        tw = _time(f_win, (x, wk), args.iters)
        line = (f"{name:>12} {td:8.2f}ms {tw:8.2f}ms"
                f"  [{flops/td/1e9:.0f}/{flops/tw/1e9:.0f} TF/s eff]")

        if not args.fwd_only:
            def loss(fn):
                return jax.jit(jax.grad(
                    lambda x, w: jnp.sum(fn(x, w).astype(jnp.float32) ** 2),
                    argnums=(0, 1)))
            gd = _time(loss(direct_conv), (x, wk), args.iters)
            gw = _time(loss(winograd_conv3x3), (x, wk), args.iters)
            verdict = "WIN" if gw < gd and tw < td else (
                "win-bwd" if gw < gd else "lose")
            line += f" | {gd:8.2f} {gw:8.2f}  {verdict:>8}"
        print(line)


if __name__ == "__main__":
    main()
