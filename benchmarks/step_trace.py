#!/usr/bin/env python
"""Trace the FULL train step on TPU and print top ops by device time."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.vgg_trace import trace_and_parse


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--pc-backbone", type=str, default="pointnet",
                    choices=["pointnet", "dgcnn"])
    ap.add_argument("--pc-dist", type=str, default="cd",
                    choices=["cd", "emd"])
    ap.add_argument("--out", type=str, default="/tmp/step_trace")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from fpsg_tpu.data import DeviceCorpus, synthetic_corpus
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.train import (
        TrainState, init_model, make_optimizer, make_train_step,
    )

    S, Q, NPTS, IMG = 32, 1, 2048, 224
    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone=args.pc_backbone,
        metric=args.pc_dist,
        intra_support=True, dtype=jnp.bfloat16,
    )
    corpus = DeviceCorpus.build(synthetic_corpus(
        n_classes=3, items_per_class=40, n_pts=NPTS, img_size=IMG))
    key = jax.random.PRNGKey(0)
    sample = {
        "xs": jnp.zeros((S, IMG, IMG, 3)), "xq": jnp.zeros((Q, IMG, IMG, 3)),
        "xad": jnp.zeros((S, IMG, IMG, 3)), "pcs": jnp.zeros((S, NPTS, 3)),
        "pcq": jnp.zeros((Q, NPTS, 3)), "pcad": jnp.zeros((S, NPTS, 3)),
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
    # One priming call: its OUTPUT state carries the step's pinned
    # entry/exit layouts. Tracing with the raw init state instead would
    # add a per-call host-inserted relayout transfer (~2.5 ms of copy
    # ops that the donating production path never runs).
    state, _ = step(state, corpus, key)
    trace_and_parse(lambda st, k: step(st, corpus, k),
                    (state, key), args.out, steps=3)


if __name__ == "__main__":
    main()
