#!/usr/bin/env python
"""FULL train step at sp-motivating scale: N=16384-point clouds.

Round-3 sp evidence probed the encoder + ring chamfer at N=4096
(sp_scaling.py); this runs the WHOLE training objective — VGG image
branch (replicated), point-sharded PointNet, point-sharded decoder,
ring-chamfer reconstruction, parameter gradients — at a cloud size
that does NOT fit one chip's training footprint (see --probe-boundary),
on the 8-device virtual CPU mesh (or a real mesh when present).

Memory argument (bf16 activations, the flagship episode S=32, Q=1):
the PointNet trunk alone holds (2S, N, 1024) + (2S, N, 128) + ... live
for the backward — at N=16384 that is ~2.3 GB for conv3's output alone
(65*16384*1024*2B), ~4x the whole N=2048 step's working set; the
decoder's node chain adds (S+Q, N, 1539..769..384) tensors (~2.2 GB
more), pushing the unsharded step past the v5e's ~16 GB HBM once
params+moments (~2.8 GB) and XLA scratch are counted. Under sp=8 every
point-dim tensor is 1/8th per device. --probe-boundary measures the
real single-chip OOM point instead of trusting this arithmetic.

Usage (CPU virtual mesh, from /root/repo, no PYTHONPATH):
    python benchmarks/sp_full_step.py [--n 16384] [--sp 8] [--img 32]
    python benchmarks/sp_full_step.py --probe-boundary   # real TPU
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n_pts, img, s, q, c, nn_, sp_axis, img_backbone, dtype_str):
    import jax.numpy as jnp

    from fpsg_tpu.models import ImgPCProtoNet

    dtype = jnp.bfloat16 if dtype_str == "bf16" else None
    return ImgPCProtoNet(
        img_backbone=img_backbone, pc_backbone="pointnet",
        num_clusters=c, num_nodes=nn_, num_points=n_pts,
        intra_support=True, dtype=dtype, point_axis_name=sp_axis,
    )


def episode(rng, n_pts, img, s, q):
    import jax.numpy as jnp

    f32 = lambda *sh: jnp.asarray(
        rng.standard_normal(sh, dtype="float32"))
    return {
        "xs": f32(s, img, img, 3), "xq": f32(q, img, img, 3),
        "xad": f32(s, img, img, 3),
        "pcs": f32(s, n_pts, 3) * 0.3, "pcq": f32(q, n_pts, 3) * 0.3,
        "pcad": f32(s, n_pts, 3) * 0.3,
    }


def run_sp(args):
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) >= args.sp, (
        f"{args.sp} devices needed, have {len(devs)} — run under the "
        "test env (XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu) or a real mesh")
    mesh = Mesh(np.array(devs[:args.sp]), ("sp",))
    rng = np.random.default_rng(0)

    model_sp = build(args.n, args.img, args.s, args.q, args.c, args.nn,
                     "sp", args.img_backbone, args.dtype)
    # init through an unsharded SMALL-N twin: parameter shapes don't
    # depend on num_points, and init executes a forward — doing that at
    # N=16384 on one device is exactly what sp exists to avoid
    n_init = 16 * args.c * args.nn
    model_init = build(n_init, args.img, args.s, args.q, args.c,
                       args.nn, None, args.img_backbone, args.dtype)
    jb = episode(rng, args.n, args.img, args.s, args.q)
    variables = model_init.init(
        {"params": jax.random.PRNGKey(0),
         "template": jax.random.PRNGKey(1)},
        jax.tree.map(lambda x: x[:, :n_init] if x.ndim == 3 else x, jb),
        True)

    specs = {"xs": P(), "xq": P(), "xad": P(),
             "pcs": P(None, "sp", None), "pcq": P(None, "sp", None),
             "pcad": P(None, "sp", None)}

    def loss_fn(params, stats, sample):
        out, _ = model_sp.apply(
            {"params": params, "batch_stats": stats}, sample, True,
            method="loss", rngs={"template": jax.random.PRNGKey(7)},
            mutable=["batch_stats"])
        return out["ttl_loss"]

    grad_fn = jax.jit(shard_map(
        jax.grad(loss_fn), mesh=mesh,
        in_specs=(P(), P(), specs), out_specs=P(), check_vma=False))

    t0 = time.perf_counter()
    g = grad_fn(variables["params"], variables["batch_stats"], jb)
    gnorm = float(sum(float(jnp.sum(jnp.abs(x)))
                      for x in jax.tree.leaves(g)))
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    g = grad_fn(variables["params"], variables["batch_stats"], jb)
    jax.tree.map(lambda x: x.block_until_ready(), g)
    steady = time.perf_counter() - t0
    assert np.isfinite(gnorm), gnorm

    local_pts = args.n // args.sp
    out = {
        "metric": "sp_full_step",
        "n_points": args.n, "sp": args.sp,
        "points_per_device": local_pts,
        "img_size": args.img, "n_support": args.s,
        "backend": jax.default_backend(),
        "grad_abs_sum": round(gnorm, 3),
        "first_call_s": round(compile_and_first, 1),
        "steady_step_s": round(steady, 2),
        "note": ("full ImgPCProtoNet loss+grad with every point-dim "
                 "tensor sharded 1/sp per device; see module docstring "
                 "for the single-chip memory argument"),
    }
    print(json.dumps(out))


def probe_boundary(args):
    """Real-TPU: bisect the largest N where the UNSHARDED flagship train
    step still fits one chip (the motivation line for sp)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from fpsg_tpu.train import (
        TrainState, init_model, make_optimizer, make_train_step,
    )
    from fpsg_tpu.data import DeviceCorpus, synthetic_corpus

    results = {}
    for n_pts in args.boundary_sizes:
        try:
            model = build(n_pts, args.img, args.s, args.q, args.c,
                          args.nn, None, args.img_backbone, args.dtype)
            corpus = DeviceCorpus.build(synthetic_corpus(
                n_classes=2, items_per_class=2 * args.s,
                n_pts=n_pts, img_size=args.img))
            sample = {
                "xs": jnp.zeros((args.s, args.img, args.img, 3)),
                "xq": jnp.zeros((args.q, args.img, args.img, 3)),
                "xad": jnp.zeros((args.s, args.img, args.img, 3)),
                "pcs": jnp.zeros((args.s, n_pts, 3)),
                "pcq": jnp.zeros((args.q, n_pts, 3)),
                "pcad": jnp.zeros((args.s, n_pts, 3)),
            }
            variables = init_model(model, sample)
            tx = make_optimizer()
            state = TrainState(
                params=variables["params"],
                batch_stats=variables["batch_stats"],
                opt_state=tx.init(variables["params"]),
                step=jnp.zeros((), jnp.int32))
            step = make_train_step(model, tx, n_support=args.s,
                                   n_query=args.q, n_episodes=1)
            state, metrics = step(state, corpus,
                                  jax.random.PRNGKey(0))
            val = float(jax.device_get(metrics["query_rec_loss"]).sum())
            results[n_pts] = f"fits (loss {val:.3f})"
            del state, step, corpus, variables
        except Exception as e:  # noqa: BLE001 — OOM classification
            msg = str(e)
            oom = "RESOURCE_EXHAUSTED" in msg or "emory" in msg
            results[n_pts] = "OOM" if oom else f"error: {msg[:120]}"
            jax.clear_caches()
    print(json.dumps({"metric": "single_chip_n_boundary",
                      "img_size": args.img, "n_support": args.s,
                      "results": {str(k): v for k, v in
                                  results.items()}}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--sp", type=int, default=8)
    ap.add_argument("--img", type=int, default=32,
                    help="image side; the image branch is replicated "
                         "and orthogonal to sp — small keeps the CPU "
                         "virtual-mesh run tractable")
    ap.add_argument("--img-backbone", type=str, default="vgg_16")
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--q", type=int, default=1)
    ap.add_argument("--c", type=int, default=4)
    ap.add_argument("--nn", type=int, default=4)
    ap.add_argument("--dtype", type=str, default="f32")
    ap.add_argument("--probe-boundary", action="store_true",
                    help="real-TPU: find the single-chip OOM point of "
                         "the UNSHARDED flagship step over "
                         "--boundary-sizes")
    ap.add_argument("--boundary-sizes", type=int, nargs="+",
                    default=[2048, 8192, 16384, 32768])
    args = ap.parse_args()
    if args.probe_boundary:
        probe_boundary(args)
    else:
        jax_cpu_needed()
        run_sp(args)


def jax_cpu_needed():
    # CPU virtual mesh self-bootstrap (axon ignores JAX_PLATFORMS env;
    # config.update works — CLAUDE.md platform quirks)
    if os.environ.get("SP_FULL_STEP_TPU"):
        return False
    import jax

    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
    return True


if __name__ == "__main__":
    main()
