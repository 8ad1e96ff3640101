#!/usr/bin/env python
"""Evaluator throughput: episodes/s for the random-sampler eval path.

`evaluate_Network`'s hot loop is `make_eval_step` (reconstruct: CD +
Sinkhorn-EMD per query — reference `evaluate_Network.py:101-123`,
whose per-episode timing is printed at runtime but never published).
This measures OUR evaluator at the headline config (1-way 32-shot,
2048-pt clouds, 224^2 images, bf16) at the production chunk size
(`--eval_chunk`, default 16 episodes per dispatch), with and without
the EMD metric, on the real chip.

Run from /root/repo: python benchmarks/eval_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(with_emd: bool, chunk: int, steps: int, warmup: int = 2
            ) -> float:
    import jax
    import jax.numpy as jnp

    from fpsg_tpu.data import DeviceCorpus, synthetic_corpus
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.train import (
        TrainState, init_model, make_eval_step, make_optimizer,
    )

    n_support, n_query, n_pts, img = 32, 1, 2048, 224
    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet",
        intra_support=True, dtype=jnp.bfloat16,
    )
    corpus = DeviceCorpus.build(
        synthetic_corpus(n_classes=2, items_per_class=48, n_pts=n_pts,
                         img_size=img))
    sample = {k: jnp.zeros(s) for k, s in {
        "xs": (n_support, img, img, 3), "xq": (n_query, img, img, 3),
        "xad": (n_support, img, img, 3), "pcs": (n_support, n_pts, 3),
        "pcq": (n_query, n_pts, 3), "pcad": (n_support, n_pts, 3),
    }.items()}
    variables = init_model(model, sample)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=100)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_eval_step(model, n_support, n_query, with_emd=with_emd)

    key = jax.random.PRNGKey(0)
    for i in range(warmup):
        out = step(state, corpus, jax.random.fold_in(key, i), chunk)
    jax.device_get(out["cd_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        out = step(state, corpus, jax.random.fold_in(key, 100 + i), chunk)
    jax.device_get(out["cd_loss"])
    return chunk * steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    rows = []
    for with_emd in (False, True):
        eps = measure(with_emd, args.chunk, args.steps)
        rows.append({"with_emd": with_emd, "chunk": args.chunk,
                     "episodes_per_sec": round(eps, 2),
                     "ms_per_episode": round(1000.0 / eps, 2)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "eval_episodes_per_sec", "rows": rows}))


if __name__ == "__main__":
    main()
