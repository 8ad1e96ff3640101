#!/usr/bin/env python
"""Point-axis (sp) scaling curve on a virtual 8-device CPU mesh.

Companion to dp_scaling.py for the 'sp' axis (parallel/sp.py): a fixed
GLOBAL workload — B clouds of N points, PointNet encode + symmetric
ring chamfer + grads — sharded over sp in {1, 2, 4, 8}. As with dp,
wall time on a virtual CPU mesh is flat by construction (8 "devices"
share one host); the scaling evidence is XLA's per-device partitioned
cost: FLOPs/bytes per device must fall ~1/sp for the pointwise encoder
work while the chamfer ring keeps per-device distance-tile work at
(N/sp)·N — also ~1/sp. Cross-device traffic is the ring's (B, N/sp, 3)
block ppermutes + the tiny pooled all_gather, riding ICI on real
hardware.

Also asserts the loss is sp-invariant (same value at every sp).

Usage: python benchmarks/sp_scaling.py [--points 4096] [--batch 2]
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
from jax import shard_map  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from fpsg_tpu.nn.pointnet import PointNetEncoder  # noqa: E402
from fpsg_tpu.parallel.sp import ring_chamfer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    devs = jax.devices()
    assert len(devs) >= 8, "needs the 8-device virtual mesh"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, args.points, 3)),
                    jnp.float32)
    y = jnp.asarray(rng.standard_normal((args.batch, args.points, 3)),
                    jnp.float32)

    base = None
    base_flops = None
    for sp in (1, 2, 4, 8):
        mesh = Mesh(np.array(devs[:sp]), ("sp",))
        enc = PointNetEncoder(point_axis_name="sp" if sp > 1 else None)
        # init with an axis-free twin (identical param tree; the sp
        # collectives are unbound outside shard_map)
        variables = PointNetEncoder().init(
            jax.random.PRNGKey(0), x[:, :64], True)

        def loss(params, xl, yl):
            feat, _ = enc.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xl, True, mutable=["batch_stats"])
            cd = ring_chamfer(xl, yl, "sp") if sp > 1 else None
            if cd is None:
                from fpsg_tpu.ops.chamfer import chamfer_distance
                cd = chamfer_distance(xl, yl, impl="oracle")
            return jnp.sum(cd) + 1e-6 * jnp.sum(
                feat.astype(jnp.float32) ** 2)

        spec = P(None, "sp", None) if sp > 1 else P(None, None, None)
        fn = jax.jit(shard_map(
            jax.value_and_grad(loss, argnums=1), mesh=mesh,
            in_specs=(P(), spec, spec), out_specs=(P(), spec),
            check_vma=False))
        sh = NamedSharding(mesh, spec)
        xs, ys = jax.device_put(x, sh), jax.device_put(y, sh)

        lowered = fn.lower(variables["params"], xs, ys)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        gflops = float(ca.get("flops", float("nan"))) / 1e9

        val, _ = fn(variables["params"], xs, ys)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            val, g = fn(variables["params"], xs, ys)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / args.steps * 1e3

        if base is None:
            base, base_flops = float(val), gflops
        drift = abs(float(val) - base) / max(abs(base), 1e-9)
        print(f"sp={sp}: per-device {gflops:8.2f} GFLOP "
              f"({base_flops / gflops:4.2f}x less than sp=1), "
              f"wall {dt:7.1f} ms/step (flat on CPU), "
              f"loss drift {drift:.2e}")
        assert drift < 1e-4, (sp, float(val), base)


if __name__ == "__main__":
    main()
