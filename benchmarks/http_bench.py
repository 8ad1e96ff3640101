#!/usr/bin/env python
"""HTTP serving throughput under concurrent single-image clients.

`benchmarks/serve_bench.py` measures the Generator called directly with
pre-batched inputs; this measures the DEPLOYED surface — stdlib HTTP
frontend + BatchingEngine (`fpsg_tpu/serve_http.py`) — where requests
arrive one image at a time from many clients and only dynamic batching
can recover the batched device rate (reference has no serving surface
at all; its generation runs inside the evaluator, few_shot.py:179-213).

Paired A/B in ONE process (CLAUDE.md: single-sample tunnel numbers
swing 2x): the same client load against max_batch=1 (no coalescing —
what a naive per-request server does) and max_batch=B (coalesced).
Reports aggregate clouds/s, the engine's observed mean batch size, and
request latency percentiles from `/v1/stats`.

Run from /root/repo with no PYTHONPATH (CLAUDE.md axon quirks):
    python benchmarks/http_bench.py [--clients 32] [--per-client 8]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def _post(url, body, tries=5):
    # transient connect failures (RST under a connect burst while the
    # first dispatch compiles) retry; HTTP-level errors do not
    for i in range(tries):
        try:
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.read()
        except (ConnectionError, urllib.error.URLError) as e:
            if (isinstance(e, urllib.error.HTTPError)
                    or i == tries - 1):
                raise
            time.sleep(0.5 * (i + 1))


def run_load(base: str, imgs: np.ndarray, clients: int,
             per_client: int) -> float:
    """`clients` threads, each posting `per_client` single-image
    requests back-to-back; returns aggregate clouds/s."""
    errs = []
    start = threading.Barrier(clients + 1)

    def worker(i):
        try:
            start.wait()
            for j in range(per_client):
                body = _post(
                    f"{base}/v1/generate?class=bench&seed={i * 1000 + j}",
                    _npy(imgs[i % len(imgs)]))
                out = np.load(io.BytesIO(body), allow_pickle=False)
                assert np.isfinite(out).all()
        except Exception as e:  # surface, don't hang the barrier
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,), daemon=True)
               for i in range(clients)]
    for t in threads:
        t.start()
    start.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errs:
        raise errs[0]
    return clients * per_client / dt


def warm_buckets(base: str, imgs: np.ndarray, buckets, max_rounds=10):
    """Deterministically compile every dispatch bucket BEFORE the timed
    leg: a bucket first hit mid-measurement inserts a multi-minute
    remote TPU compile into the measured rate. Fires exact bucket-size
    concurrent bursts and loops until /v1/stats's batch_size_hist shows
    every bucket observed."""
    for _ in range(max_rounds):
        stats = json.loads(urllib.request.urlopen(
            base + "/v1/stats", timeout=30).read())
        seen = {int(k) for k in stats["batch_size_hist"]}
        missing = [b for b in buckets if b not in seen]
        if not missing:
            return
        for b in missing:
            run_load(base, imgs, clients=b, per_client=1)
    stats = json.loads(urllib.request.urlopen(
        base + "/v1/stats", timeout=30).read())
    seen = {int(k) for k in stats["batch_size_hist"]}
    missing = [b for b in buckets if b not in seen]
    if missing:
        print(f"WARNING: buckets {missing} never coalesced during warm "
              "(timed leg may include a compile)", file=sys.stderr)


def measure(max_batch: int, clients: int, per_client: int,
            dtype: str, n_support: int = 32, img: int = 224) -> dict:
    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.serve import Generator
    from fpsg_tpu.serve_http import BatchingEngine, make_server

    from bench import _enable_compile_cache

    _enable_compile_cache()

    conf = FPSGConfig(config_path="x", test_path="x",
                      compute_dtype=dtype)
    gen = Generator.from_checkpoint(conf, img_size=img)
    rng = np.random.default_rng(0)
    clouds = rng.standard_normal(
        (n_support, conf.num_pts, 3)).astype(np.float32) * 0.3
    imgs = rng.integers(0, 256, (8, img, img, 3), dtype=np.uint8)

    # coarse buckets: every bucket size is a separate compile of the
    # generate graph (minutes each through the remote compile helper);
    # padding a 3-request batch to 8 costs nothing on a link-bound path
    buckets = sorted({min(8, max_batch), max_batch})
    engine = BatchingEngine(gen, max_batch=max_batch, buckets=buckets,
                            max_wait_ms=8.0, seed=0).start()
    srv = make_server(engine, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        _post(base + "/v1/classes/bench", _npy(clouds))
        run_load(base, imgs, clients, 2)          # warm the common path
        warm_buckets(base, imgs, buckets)         # compile EVERY bucket
        cps = run_load(base, imgs, clients, per_client)
        stats = json.loads(urllib.request.urlopen(
            base + "/v1/stats", timeout=30).read())
        return {"max_batch": max_batch, "clients": clients,
                "clouds_per_sec": round(cps, 2),
                "mean_batch": stats["mean_batch"],
                "latency_ms": stats["latency_ms"]}
    finally:
        srv.shutdown()
        engine.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--per-client", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--dtype", type=str, default="bf16")
    ap.add_argument("--img", type=int, default=224,
                    help="image side (reduce for a CPU smoke run)")
    ap.add_argument("--no-ab", action="store_true",
                    help="skip the max_batch=1 baseline leg")
    ap.add_argument("--ab-rounds", type=int, default=1,
                    help="interleave the A/B legs this many times "
                         "(A/B/A/B...): sequential paired legs can "
                         "straddle tunnel link phases (CLAUDE.md "
                         "measurement rule)")
    args = ap.parse_args()

    rows = []
    legs = ([args.max_batch] if args.no_ab
            else [1, args.max_batch] * max(1, args.ab_rounds))
    for mb in legs:
        # unbatched leg: same request COUNT, fewer per client, or it
        # takes minutes at 1-2 tunnel RTTs per request
        pc = max(1, args.per_client // 4) if mb == 1 else args.per_client
        r = measure(mb, args.clients, pc, args.dtype, img=args.img)
        rows.append(r)
        print(json.dumps(r), flush=True)
    out = {"metric": "http_serving", "dtype": args.dtype, "rows": rows}
    a = [r["clouds_per_sec"] for r in rows if r["max_batch"] == 1]
    b = [r["clouds_per_sec"] for r in rows if r["max_batch"] != 1]
    if a and b:
        out["batching_speedup"] = round(
            (sum(b) / len(b)) / (sum(a) / len(a)), 2)
        if len(a) > 1:
            out["per_round_speedup"] = [
                round(y / x, 2) for x, y in zip(a, b)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
