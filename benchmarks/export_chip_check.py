#!/usr/bin/env python
"""Real-chip check of the serving-export artifacts (base and --int8).

`tests/test_serve_export.py` / `test_serve_quant.py` prove the
StableHLO artifact roundtrip on CPU; this is the one-command version of
the round-3j ad-hoc check that the SAME artifacts load and reproduce
the live generator ON the device backend that serving would actually
run (platforms=["tpu"] when the axon tunnel is up). Tiny model shapes —
the point is lowering/executing the exported module on the real
backend, not throughput (serve_bench.py owns rates).

Run from /root/repo with no PYTHONPATH (CLAUDE.md axon quirks):
    python benchmarks/export_chip_check.py [--int8] [--img 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--npts", type=int, default=64)
    ap.add_argument("--int8", action="store_true",
                    help="check ONLY the int8-encoder artifact "
                         "(default: both)")
    args = ap.parse_args()

    import jax

    from bench import _enable_compile_cache
    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.serve import Generator
    from fpsg_tpu.serve_export import ExportedGenerator, export_generator

    _enable_compile_cache()
    platform = jax.devices()[0].platform
    conf = FPSGConfig(config_path="x", test_path="x", num_clusters=2,
                      num_nodes=2, num_pts=args.npts,
                      bottleneck_size=256, n_shot=2, seed=6)
    gen = Generator.from_checkpoint(conf, img_size=args.img)
    rng = np.random.default_rng(0)
    clouds = rng.standard_normal(
        (3, args.npts, 3)).astype(np.float32) * 0.3
    proto = gen.prototype(clouds)
    imgs = rng.integers(0, 256, (2, args.img, args.img, 3),
                        dtype=np.uint8)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    rows = []
    for use_int8 in ([True] if args.int8 else [False, True]):
        with tempfile.TemporaryDirectory() as tmp:
            out = os.path.join(tmp, "art")
            manifest = export_generator(
                gen, out, img_size=args.img, n_support=3,
                n_points_per_cloud=args.npts,
                platforms=[platform], int8=use_int8)
            g2 = ExportedGenerator(out)
            proto2 = g2.prototype(clouds)
            exp = np.asarray(g2.generate(imgs, proto2, keys=keys))
            if use_int8:
                from fpsg_tpu.serve_quant import QuantizedGenerator

                live = QuantizedGenerator(gen).generate_keyed(
                    imgs, proto=proto, keys=keys)
            else:
                live = gen.generate_keyed(imgs, proto=proto, keys=keys)
            scale = float(np.abs(live).max())
            rows.append({
                "int8": use_int8,
                "platform": platform,
                "proto_maxdiff": float(
                    np.abs(np.asarray(proto2) - np.asarray(proto)).max()),
                "gen_rel_maxdiff": float(
                    np.abs(exp - np.asarray(live)).max() / scale),
                "manifest_int8": manifest.get("int8_encoder", False),
            })
            print(json.dumps(rows[-1]), flush=True)
    ok = all(r["gen_rel_maxdiff"] < 0.01 and r["proto_maxdiff"] < 1e-4
             for r in rows)
    print(json.dumps({"metric": "export_chip_check",
                      "platform": platform, "ok": ok, "rows": rows}))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
