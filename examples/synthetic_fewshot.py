#!/usr/bin/env python
"""Reproducible few-shot convergence demo (the BASELINE.md tables).

Trains the flagship pipeline (VGG16-bn + PointNet + primitive decoder) on
procedural shape classes and evaluates on held-out novel classes — the
actual few-shot generation task, no external data needed.

    python examples/synthetic_fewshot.py --n_shot 8 --epochs 40
    python examples/synthetic_fewshot.py --n_shot 32 \
        --pc_encoder_path /root/reference/checkpoint/pretrain_pointnet/pretrained_pcencoder_pointnet.pt
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_shot", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--episodes_per_epoch", type=int, default=25)
    ap.add_argument("--n_pts", type=int, default=2048)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--compute_dtype", default="bf16",
                    choices=["f32", "bf16"])
    ap.add_argument("--pc_encoder_path", default="",
                    help="optional torch/native pretrained encoder")
    ap.add_argument("--eval_episodes", type=int, default=16)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
    except Exception:
        pass

    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.data import ClassCorpus, DeviceCorpus, synthetic_corpus
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.train import (
        TrainState, init_model, make_eval_step, make_optimizer,
        make_train_step,
    )
    from fpsg_tpu.train.loop import load_pretrained_weights

    full = synthetic_corpus(
        n_classes=5, items_per_class=max(args.n_shot + 8, 24),
        n_pts=args.n_pts, img_size=args.img_size, seed=2,
    )
    train_dev = DeviceCorpus.build(
        ClassCorpus(full.class_names[:3], full.images[:3], full.clouds[:3]))
    novel_dev = DeviceCorpus.build(
        ClassCorpus(full.class_names[3:], full.images[3:], full.clouds[3:]))
    print(f"train classes: {train_dev.class_names} | "
          f"novel classes: {novel_dev.class_names}")

    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet", intra_support=True,
        dtype=jnp.bfloat16 if args.compute_dtype == "bf16" else None,
    )
    s, q = args.n_shot, 1
    sample = {k: jnp.zeros(shape) for k, shape in {
        "xs": (s, args.img_size, args.img_size, 3),
        "xq": (q, args.img_size, args.img_size, 3),
        "xad": (s, args.img_size, args.img_size, 3),
        "pcs": (s, args.n_pts, 3),
        "pcq": (q, args.n_pts, 3),
        "pcad": (s, args.n_pts, 3)}.items()}
    variables = init_model(model, sample)
    variables = load_pretrained_weights(
        variables, FPSGConfig(pc_encoder_path=args.pc_encoder_path)
    )
    tx = make_optimizer(lr=1e-3, steps_per_epoch=args.episodes_per_epoch)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_train_step(model, tx, s, q, 1, donate=False)
    evl = make_eval_step(model, s, q, with_emd=False)

    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    for epoch in range(1, args.epochs + 1):
        tot = 0.0
        for _ in range(args.episodes_per_epoch):
            key, sub = jax.random.split(key)
            state, m = step(state, train_dev, sub)
            tot += float(m["query_rec_loss"][0])
        if epoch % max(args.epochs // 5, 1) == 0 or epoch == 1:
            key, sub = jax.random.split(key)
            out = evl(state, novel_dev, sub, args.eval_episodes)
            print(f"epoch {epoch:3d}: train CD "
                  f"{tot / args.episodes_per_epoch:.4f} | novel-class eval "
                  f"CD {float(np.mean(np.asarray(out['cd_loss']))):.4f}",
                  flush=True)
    n_total = args.epochs * args.episodes_per_epoch
    print(f"done: {n_total} episodes in {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()
