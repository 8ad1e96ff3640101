#!/usr/bin/env python
"""Per-component step-time breakdown at bench shapes (1 real TPU chip).

Times jitted forward+backward of each compute branch in isolation at the
headline config's shapes (32-shot, 2048 pts, 224^2 images, bf16), plus the
full train step — the data that decides where fusion work pays.

Usage: python benchmarks/component_bench.py [--dtype bf16] [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# repo-root import shim (PYTHONPATH breaks the axon plugin — CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _cache():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def timeit(fn, args, steps, warmup=3, tag=""):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # axon: block doesn't drain
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"{tag:40s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    _cache()

    from fpsg_tpu.nn.decoder import PrimitiveDecoder
    from fpsg_tpu.nn.pointnet import PointNetEncoder
    from fpsg_tpu.nn.vgg import VGG16BN
    from fpsg_tpu.ops.chamfer import chamfer_distance

    dt = jnp.bfloat16 if args.dtype == "bf16" else None
    S, Q, NPTS, IMG = 32, 1, 2048, 224
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    # ---- VGG16-bn on the episode's [ad ‖ query] batch (33 images) -------
    vgg = VGG16BN(dtype=dt)
    x_img = jax.random.normal(ks[0], (S + Q, IMG, IMG, 3), jnp.float32)
    v_vgg = vgg.init(ks[1], x_img, True)

    @jax.jit
    def vgg_fwdbwd(params, batch_stats, x):
        def f(p):
            out, _ = vgg.apply({"params": p, "batch_stats": batch_stats},
                               x, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.value_and_grad(f)(params)

    timeit(vgg_fwdbwd, (v_vgg["params"], v_vgg["batch_stats"], x_img),
           args.steps, tag=f"VGG16-bn fwd+bwd ({S + Q}x{IMG}^2)")

    # ---- PointNet on [support ‖ ad] (64 clouds) --------------------------
    pn = PointNetEncoder(dtype=dt)
    x_pc = jax.random.normal(ks[2], (2 * S, NPTS, 3), jnp.float32) * 0.3
    v_pn = pn.init(ks[3], x_pc, True)

    @jax.jit
    def pn_fwdbwd(params, batch_stats, x):
        def f(p):
            out, _ = pn.apply({"params": p, "batch_stats": batch_stats},
                              x, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.value_and_grad(f)(params)

    timeit(pn_fwdbwd, (v_pn["params"], v_pn["batch_stats"], x_pc),
           args.steps, tag=f"PointNet fwd+bwd ({2 * S}x{NPTS})")

    # ---- Decoder: support pass (B=32) and query pass (B=1) --------------
    dec = PrimitiveDecoder(dtype=dt)
    for b, tag in [(S, "decoder fwd+bwd support (B=32)"),
                   (Q, "decoder fwd+bwd query   (B=1)")]:
        h = jax.random.normal(ks[4], (b, 1536), jnp.float32)
        v_dec = dec.init(
            {"params": ks[5], "template": ks[6]}, h, True
        )

        @jax.jit
        def dec_fwdbwd(params, batch_stats, h):
            def f(p):
                out, _ = dec.apply(
                    {"params": p, "batch_stats": batch_stats}, h, True,
                    mutable=["batch_stats"], rngs={"template": ks[7]},
                )
                return jnp.sum(out ** 2)
            return jax.value_and_grad(f)(params)

        timeit(dec_fwdbwd, (v_dec["params"], v_dec["batch_stats"], h),
               args.steps, tag=tag)

    # ---- Chamfer (33 pairs, fwd+bwd) -------------------------------------
    a = jax.random.normal(ks[0], (S + Q, NPTS, 3), jnp.float32) * 0.3
    b = jax.random.normal(ks[1], (S + Q, NPTS, 3), jnp.float32) * 0.3

    @jax.jit
    def cd_fwdbwd(a, b):
        return jax.value_and_grad(
            lambda a: jnp.sum(chamfer_distance(a, b))
        )(a)

    timeit(cd_fwdbwd, (a, b), args.steps,
           tag=f"chamfer fwd+bwd ({S + Q}x{NPTS})")

    # ---- Full train step --------------------------------------------------
    from fpsg_tpu.data import DeviceCorpus, synthetic_corpus
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.train import (
        TrainState, init_model, make_optimizer, make_train_step,
    )

    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet",
        intra_support=True, dtype=dt,
    )
    corpus = DeviceCorpus.build(synthetic_corpus(
        n_classes=3, items_per_class=40, n_pts=NPTS, img_size=IMG))
    sample = {
        "xs": x_img[:S], "xq": x_img[:Q], "xad": x_img[:S],
        "pcs": x_pc[:S], "pcq": x_pc[:Q], "pcad": x_pc[:S],
    }
    variables = init_model(model, sample)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=100)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(model, tx, n_support=S, n_query=Q,
                           n_episodes=1, donate=False)

    def full(state, k):
        return step(state, corpus, k)

    timeit(full, (state, jax.random.PRNGKey(9)), max(args.steps // 2, 5),
           tag="FULL train step (E=1)")


if __name__ == "__main__":
    main()
