#!/usr/bin/env python
"""Host-corpus pipeline vs HBM-resident corpus: training episodes/s.

`--host_corpus` (data/host_pipeline.py) is the SURVEY.md §7 fallback
for corpora larger than device HBM: numpy episode assembly on a
prefetch thread, uint8 images over the link, device-side normalize.
This measures what that fallback costs at the headline config
(1-way 32-shot intra, 224^2 images, 2048-pt clouds, bf16) against the
default on-device sampling path (`bench.py`), on the real chip.

The reference's loop is the host path WITHOUT the prefetch overlap or
the uint8 link (synchronous f32 assembly + H2D per step,
trainNetwork.py:140-141), so the host number here is an upper bound
on its pipeline.

Run from /root/repo: python benchmarks/host_pipeline_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_host(steps: int, warmup: int = 2) -> float:
    import jax
    import jax.numpy as jnp

    from fpsg_tpu.data.host_pipeline import (
        make_host_train_step, prefetched_episodes,
    )
    from fpsg_tpu.data.synthetic import synthetic_corpus
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.train import TrainState, init_model, make_optimizer

    n_support, n_query, n_pts, img = 32, 1, 2048, 224
    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet",
        intra_support=True, dtype=jnp.bfloat16,
    )
    corpus = synthetic_corpus(n_classes=2, items_per_class=48,
                              n_pts=n_pts, img_size=img)
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
    step = make_host_train_step(model, tx)
    it = prefetched_episodes(corpus, n_support, n_query, n_episodes=1)

    def sync(metrics):
        return float(jax.device_get(metrics["query_rec_loss"]).sum())

    key = jax.random.PRNGKey(0)
    for i in range(warmup):
        state, metrics = step(state, next(it), jax.random.fold_in(key, i))
    sync(metrics)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, next(it),
                              jax.random.fold_in(key, 100 + i))
    sync(metrics)
    return steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--skip-device", action="store_true")
    args = ap.parse_args()

    host_eps = measure_host(args.steps)
    print(json.dumps({"mode": "host_corpus_prefetch",
                      "episodes_per_sec": round(host_eps, 3)}), flush=True)
    if not args.skip_device:
        import bench

        dev_eps = bench.measure_ours(1, max(args.steps // 8, 3), 1,
                                     bf16_moments=True)
        print(json.dumps({"mode": "device_corpus",
                          "episodes_per_sec": round(dev_eps, 3)}))
        print(json.dumps({"metric": "host_vs_device_eps",
                          "host": round(host_eps, 3),
                          "device": round(dev_eps, 3),
                          "ratio": round(host_eps / dev_eps, 3)}))


if __name__ == "__main__":
    main()
