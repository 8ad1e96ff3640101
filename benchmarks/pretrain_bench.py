#!/usr/bin/env python
"""Pretraining throughput: steps/s and clouds/s for trainPointAE.

The reference pretrains its PointNet encoder as a classifier
(`src/trainPointAE.py`, batch 32 x 2048 points, Adam, NLL); it
publishes no throughput. This measures our equivalent step
(`train/pretrain.py:make_pretrain_step`) on the real chip — the last
CLI surface without a measured rate.

Run from /root/repo: python benchmarks/pretrain_bench.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch: int, steps: int, core: str = "pointnet",
            n_pts: int = 2048, warmup: int = 3) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _enable_compile_cache
    from fpsg_tpu.train.pretrain import PCClassifier, make_pretrain_step
    from fpsg_tpu.train.state import TrainState

    _enable_compile_cache()
    model = PCClassifier(core=core, num_classes=10)
    rng = np.random.default_rng(0)
    pcs = jnp.asarray(rng.standard_normal((batch, n_pts, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, (batch,)), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        pcs, True)
    tx = optax.adam(1e-3)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_pretrain_step(model, tx)

    key = jax.random.PRNGKey(2)
    for i in range(warmup):
        state, metrics = step(state, pcs, labels, jax.random.fold_in(key, i))
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, pcs, labels,
                              jax.random.fold_in(key, 100 + i))
    jax.device_get(metrics["loss"])
    return steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cores", type=str, nargs="+", default=["pointnet"])
    args = ap.parse_args()

    rows = []
    for core in args.cores:
        sps = measure(args.batch, args.steps, core=core)
        rows.append({"core": core, "batch": args.batch,
                     "steps_per_sec": round(sps, 2),
                     "clouds_per_sec": round(sps * args.batch, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "pretrain_steps_per_sec", "rows": rows}))


if __name__ == "__main__":
    main()
