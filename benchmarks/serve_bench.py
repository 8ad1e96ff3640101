#!/usr/bin/env python
"""Serving throughput: clouds generated per second (`fpsg_tpu/serve.py`).

The reference has no inference entry point to compare against (its
generation runs inside the evaluator, one matplotlib dump at a time —
few_shot.py:179-213); this measures OUR serving surface at production
shapes on the real chip: a trained-shape flagship model (VGG16-bn +
PointNet + 4x4 decoder, 224^2 images, 2048-point clouds), batch sizes
swept, f32 vs bf16 compute.

Run from /root/repo with no PYTHONPATH (CLAUDE.md axon quirks):
    python benchmarks/serve_bench.py [--batches 1 8 32] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache():
    from bench import _enable_compile_cache

    _enable_compile_cache()


def measure(batch: int, dtype: str, steps: int, n_support: int = 32,
            img: int = 224, warmup: int = 2, proto: bool = False) -> float:
    import jax

    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.serve import Generator

    _cache()

    conf = FPSGConfig(config_path="x", test_path="x",
                      compute_dtype=dtype)
    gen = Generator.from_checkpoint(conf, img_size=img)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, img, img, 3), dtype=np.uint8)
    clouds = rng.standard_normal(
        (n_support, conf.num_pts, 3)).astype(np.float32) * 0.3
    kw = {"proto": gen.prototype(clouds)} if proto else {}
    args = () if proto else (clouds,)

    for _ in range(warmup):
        out = gen(imgs, *args, **kw)     # __call__ copies to host: sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = gen(imgs, *args, **kw)
    dt = time.perf_counter() - t0
    assert np.isfinite(out).all()
    return batch * steps / dt


def measure_latency(batch: int, dtype: str, steps: int,
                    n_support: int = 32, img: int = 224,
                    warmup: int = 3) -> dict:
    """Per-call latency percentiles (proto hot path) — the number an
    online deployment actually budgets against, where throughput rows
    hide the tail."""
    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.serve import Generator

    _cache()
    conf = FPSGConfig(config_path="x", test_path="x",
                      compute_dtype=dtype)
    gen = Generator.from_checkpoint(conf, img_size=img)
    rng = np.random.default_rng(0)
    clouds = rng.standard_normal(
        (n_support, conf.num_pts, 3)).astype(np.float32) * 0.3
    proto = gen.prototype(clouds)
    imgs = rng.integers(0, 256, (batch, img, img, 3), dtype=np.uint8)

    for _ in range(warmup):
        gen(imgs, proto=proto)
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        out = gen(imgs, proto=proto)
        times.append((time.perf_counter() - t0) * 1000.0)
    assert np.isfinite(out).all()
    t = np.sort(np.asarray(times))

    def pct(p):
        return round(float(np.percentile(t, p)), 2)

    return {"batch": batch, "dtype": dtype, "n": steps,
            "p50_ms": pct(50), "p90_ms": pct(90), "p99_ms": pct(99),
            "max_ms": round(float(t[-1]), 2)}


def measure_stream(batch: int, dtype: str, steps: int,
                   n_support: int = 32, img: int = 224,
                   warmup: int = 2) -> float:
    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.serve import Generator

    _cache()

    conf = FPSGConfig(config_path="x", test_path="x",
                      compute_dtype=dtype)
    gen = Generator.from_checkpoint(conf, img_size=img)
    rng = np.random.default_rng(0)
    clouds = rng.standard_normal(
        (n_support, conf.num_pts, 3)).astype(np.float32) * 0.3
    proto = gen.prototype(clouds)
    imgs = rng.integers(0, 256, (batch, img, img, 3), dtype=np.uint8)

    for out in gen.stream(iter([imgs] * warmup), proto=proto):
        pass                            # compile + warm
    t0 = time.perf_counter()
    n = 0
    for out in gen.stream(iter([imgs] * steps), proto=proto):
        n += out.shape[0]
    dt = time.perf_counter() - t0
    assert np.isfinite(out).all() and n == batch * steps
    return n / dt


def measure_int8_ab(batch: int, dtype: str, steps: int,
                    n_support: int = 32, img: int = 224,
                    warmup: int = 2, loop_iters: int = 20) -> dict:
    """Paired A/B (one process, CLAUDE.md): baseline vs int8-quantized
    generator on the SAME hot path (generate_keyed, cached proto), plus
    an on-device fori_loop whole-encoder rate that the tunnel cannot
    pollute (per-dispatch serving here is link-bound, 1-2 RTTs —
    BASELINE.md round-3i — so wall-clock alone understates the chip win
    int8_probe_device.py measured at the conv level)."""
    import jax
    import jax.numpy as jnp

    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.serve import Generator
    from fpsg_tpu.serve_quant import QuantizedGenerator, quant_vgg_forward

    _cache()
    conf = FPSGConfig(config_path="x", test_path="x",
                      compute_dtype=dtype)
    gen = Generator.from_checkpoint(conf, img_size=img)
    qgen = QuantizedGenerator(gen)
    rng = np.random.default_rng(0)
    clouds = rng.standard_normal(
        (n_support, conf.num_pts, 3)).astype(np.float32) * 0.3
    proto = gen.prototype(clouds)
    imgs = rng.integers(0, 256, (batch, img, img, 3), dtype=np.uint8)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    def rate(g):
        for _ in range(warmup):
            out = g.generate_keyed(imgs, proto=proto, keys=keys)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = g.generate_keyed(imgs, proto=proto, keys=keys)
        dt = time.perf_counter() - t0
        assert np.isfinite(out).all()
        return batch * steps / dt

    # INTERLEAVED A/B/A/B (BASELINE.md round-3k): sequential paired
    # legs straddle tunnel link phases — a base leg in a slow phase
    # once printed a spurious 1.78x "int8 win" that an A/B/A/B showed
    # to be neutral. Two legs each, mean of means.
    legs = [rate(g) for g in (gen, qgen, gen, qgen)]
    base_cps = (legs[0] + legs[2]) / 2
    int8_cps = (legs[1] + legs[3]) / 2

    # --- on-device encoder loop: data-dependent iterations, one dispatch
    from fpsg_tpu.data.corpus import normalize_images

    x0 = jnp.asarray(normalize_images(jnp.asarray(imgs)))
    cdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32

    @jax.jit
    def loop_base(variables, x):
        def body(_, a):
            z = gen.model.apply(
                variables, a.astype(cdt), False,
                method=lambda m, xq, train: m.img_encoder(xq, train))
            return x * (1.0 + 1e-12 * jnp.mean(z).astype(jnp.float32))

        return jax.lax.fori_loop(0, loop_iters, body, x)

    @jax.jit
    def loop_int8(qlayers, x):
        def body(_, a):
            z = quant_vgg_forward(qlayers, a)
            return x * (1.0 + 1e-12 * jnp.mean(z))

        return jax.lax.fori_loop(0, loop_iters, body, x)

    def loop_ms(fn, *args, n=3):
        r = fn(*args)
        jax.device_get(r[0, 0, 0, 0])
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn(*args)
            jax.device_get(r[0, 0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2] / loop_iters * 1e3

    base_ms = loop_ms(loop_base, gen.variables, x0)
    int8_ms = loop_ms(loop_int8, qgen.qlayers, x0)
    return {
        "batch": batch, "dtype": dtype,
        "keyed_clouds_per_sec": {"base": round(base_cps, 2),
                                 "int8": round(int8_cps, 2),
                                 "ratio": round(int8_cps / base_cps, 3),
                                 "legs_abab": [round(x, 2) for x in legs]},
        "encoder_device_ms": {"base": round(base_ms, 3),
                              "int8": round(int8_ms, 3),
                              "speedup": round(base_ms / int8_ms, 3)},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--dtypes", type=str, nargs="+",
                    default=["bf16", "f32"])
    ap.add_argument("--stream", action="store_true",
                    help="measure the pipelined Generator.stream path "
                         "instead of per-call serving")
    ap.add_argument("--latency", action="store_true",
                    help="per-call latency percentiles on the proto "
                         "hot path")
    ap.add_argument("--int8", action="store_true",
                    help="paired baseline-vs-int8 A/B on the keyed hot "
                         "path + on-device encoder loop")
    args = ap.parse_args()

    if args.int8:
        rows = [measure_int8_ab(b, d, args.steps)
                for d in args.dtypes for b in args.batches]
        for r in rows:
            print(json.dumps(r), flush=True)
        print(json.dumps({"metric": "serve_int8_ab", "rows": rows}))
        return

    if args.latency:
        rows = [measure_latency(b, d, args.steps)
                for d in args.dtypes for b in args.batches]
        for r in rows:
            print(json.dumps(r), flush=True)
        print(json.dumps({"metric": "serve_latency_ms", "rows": rows}))
        return

    if args.stream:
        rows = []
        for dtype in args.dtypes:
            for b in args.batches:
                cps = measure_stream(b, dtype, args.steps)
                rows.append({"batch": b, "dtype": dtype, "stream": True,
                             "clouds_per_sec": round(cps, 2),
                             "ms_per_cloud": round(1000.0 / cps, 3)})
                print(json.dumps(rows[-1]), flush=True)
        print(json.dumps({"metric": "serve_stream_clouds_per_sec",
                          "rows": rows}))
        return

    rows = []
    for dtype in args.dtypes:
        for b in args.batches:
            for proto in (False, True):
                cps = measure(b, dtype, args.steps, proto=proto)
                rows.append({"batch": b, "dtype": dtype,
                             "proto_cached": proto,
                             "clouds_per_sec": round(cps, 2),
                             "ms_per_cloud": round(1000.0 / cps, 3)})
                print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"metric": "serve_clouds_per_sec", "rows": rows}))


if __name__ == "__main__":
    main()
