#!/usr/bin/env python
"""Data-parallel scaling curve on a virtual 8-device CPU mesh.

One TPU chip cannot demonstrate dp-axis scaling (VERDICT r1 item 5), so
this measures the shape of it: the same train step at a fixed GLOBAL batch
of E=8 episodes/step, sharded over dp in {1, 2, 4, 8} virtual CPU devices.

Wall time on a virtual CPU mesh is NOT expected to improve — the 8
"devices" share one host's cores, so total work/total cores is constant.
The scaling evidence is the PER-DEVICE compiled cost: XLA's cost analysis
of the partitioned module (FLOPs and bytes per device) must shrink
~1/dp, with the gradient all-reduce as the only cross-device traffic.
That per-device program is what each chip of a real pod slice executes;
on ICI the wall time follows the per-device cost.

Prints one line per dp size: per-device GFLOPs (and its ratio vs dp=1),
wall ms/step (expected ~flat on CPU), and the step output equivalence.

Usage: python benchmarks/dp_scaling.py [--steps 3] [--episodes 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--n_shot", type=int, default=4)
    ap.add_argument("--n_pts", type=int, default=256)
    ap.add_argument("--img", type=int, default=32)
    args = ap.parse_args()

    from fpsg_tpu.data import DeviceCorpus, synthetic_corpus
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.parallel import make_mesh, shard_train_state
    from fpsg_tpu.train import (
        TrainState, init_model, make_optimizer, make_train_step,
    )

    S, Q, E = args.n_shot, 1, args.episodes
    model = ImgPCProtoNet(
        img_backbone="tiny", pc_backbone="pointnet", intra_support=True,
        num_clusters=4, num_nodes=4, num_points=args.n_pts,
        bottleneck_size=1536,
    )
    corpus = DeviceCorpus.build(synthetic_corpus(
        n_classes=3, items_per_class=2 * S + 2,
        n_pts=args.n_pts, img_size=args.img))
    sample = {
        "xs": jnp.zeros((S, args.img, args.img, 3)),
        "xq": jnp.zeros((Q, args.img, args.img, 3)),
        "xad": jnp.zeros((S, args.img, args.img, 3)),
        "pcs": jnp.zeros((S, args.n_pts, 3)),
        "pcq": jnp.zeros((Q, args.n_pts, 3)),
        "pcad": jnp.zeros((S, args.n_pts, 3)),
    }
    variables = init_model(model, sample)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=100)
    base_state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    flops1 = None
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(dp=dp, mp=1)
        step = make_train_step(model, tx, n_support=S, n_query=Q,
                               n_episodes=E, donate=False, mesh=mesh)
        state = shard_train_state(base_state, mesh)
        corpus_r = jax.device_put(
            corpus, jax.NamedSharding(mesh, jax.sharding.PartitionSpec()))

        # Per-device cost of the partitioned module (SPMD: every device
        # runs this program on its episode shard).
        lowered = step.lower(state, corpus_r, jax.random.PRNGKey(0))
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        gflops = float(cost.get("flops", float("nan"))) / 1e9

        state, m = step(state, corpus_r, jax.random.PRNGKey(0))  # warm
        jax.device_get(m["query_rec_loss"])
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, m = step(state, corpus_r, jax.random.PRNGKey(i))
        jax.device_get(m["query_rec_loss"])
        dt = (time.perf_counter() - t0) / args.steps

        if flops1 is None:
            flops1 = gflops
        print(f"dp={dp}  per-device {gflops:8.2f} GFLOP "
              f"({flops1 / max(gflops, 1e-9):4.2f}x less than dp=1)  "
              f"wall {dt * 1e3:8.1f} ms/step (shared-core CPU: ~flat)")
    assert np.isfinite(float(jnp.mean(m["query_rec_loss"])))


if __name__ == "__main__":
    main()
