#!/usr/bin/env python
"""Bound the Sinkhorn-EMD approximation error against EXACT EMD at N=2048.

VERDICT r2 item 3: the production default (`sinkhorn_emd` with eps=0.01,
100 annealed iterations) is what `evaluate_Network` reports as "EMD"
(reference: ``src/models/utils.py:12-13`` used at ``few_shot.py:168``,
``evaluate_Network.py:115``) — its error vs true EMD must be a MEASURED
number at production shapes, not an extrapolation from N=48.

Exact EMD for equal-size uniform-weight clouds is an assignment problem:
  EMD_exact = (1/N) * min_perm sum_i C[i, perm(i)]
solved offline by scipy.optimize.linear_sum_assignment on the full
2048x2048 squared-euclidean cost matrix (~seconds per pair on host).

Pairs measured (both regimes the evaluator sees):
  - random: independent unit-ball clouds (large transport cost ~O(0.1));
  - model-like: cloud vs a perturbed/subsampled copy of itself — the
    reconstruction-vs-GT regime (small transport cost), where relative
    error is hardest.

Writes a markdown table and a JSON line for BASELINE.md; the pinned
fixture test is tests/test_ops_emd.py::test_production_scale_error_bound.

Run on the TPU chip (from /root/repo, no PYTHONPATH) so the measured
path is the production Pallas kernel:  python benchmarks/emd_exact_bound.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_pairs(n_pts: int, n_random: int, n_model: int, seed: int = 0):
    """(name, x, y) pairs covering both evaluator regimes."""
    rng = np.random.default_rng(seed)
    pairs = []

    def unit_ball(n):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        r = rng.random((n, 1)) ** (1 / 3)
        return (v * r).astype(np.float32)

    def shape_cloud(kind, n):
        # procedural shapes matching data/synthetic.py's corpus style
        if kind == 0:    # cube surface
            face = rng.integers(0, 6, n)
            uv = rng.random((n, 2)) * 2 - 1
            pts = np.zeros((n, 3), np.float32)
            axis, sign = face // 2, (face % 2) * 2 - 1
            for i in range(n):
                others = [a for a in range(3) if a != axis[i]]
                pts[i, axis[i]] = sign[i]
                pts[i, others] = uv[i]
            return pts * 0.6
        if kind == 1:    # sphere surface
            v = rng.normal(size=(n, 3))
            return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(
                np.float32) * 0.8
        # cylinder
        th = rng.random(n) * 2 * np.pi
        z = rng.random(n) * 2 - 1
        return np.stack(
            [0.5 * np.cos(th), 0.5 * np.sin(th), z], 1
        ).astype(np.float32)

    for i in range(n_random):
        pairs.append((f"random_{i}", unit_ball(n_pts), unit_ball(n_pts)))
    for i in range(n_model):
        kind = i % 3
        gt = shape_cloud(kind, n_pts)
        # reconstruction-like partner: same surface, independent sampling,
        # plus the kind of smooth warp + noise a partly-trained decoder
        # produces (CD ~1e-2, the evaluator's operating range)
        rec = shape_cloud(kind, n_pts)
        warp = 0.05 * np.sin(3 * rec[:, :1]) * rng.random((1, 3))
        rec = rec + warp + rng.normal(scale=0.02, size=rec.shape)
        pairs.append((f"model_{['cube','sphere','cyl'][kind]}_{i}",
                      gt, rec.astype(np.float32)))
    return pairs


def exact_emd(x: np.ndarray, y: np.ndarray) -> float:
    from scipy.optimize import linear_sum_assignment

    d = (
        (x * x).sum(1)[:, None]
        - 2.0 * (x @ y.T)
        + (y * y).sum(1)[None, :]
    )
    np.maximum(d, 0.0, out=d)
    r, c = linear_sum_assignment(d)
    return float(d[r, c].sum() / x.shape[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pts", type=int, default=2048)
    ap.add_argument("--n-random", type=int, default=10)
    ap.add_argument("--n-model", type=int, default=10)
    ap.add_argument("--eps", type=float, default=0.01)
    ap.add_argument("--n-iters", type=int, default=100)
    ap.add_argument("--sweep", action="store_true",
                    help="also sweep eps/n_iters candidates")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fpsg")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from fpsg_tpu.ops.emd import sinkhorn_emd

    pairs = make_pairs(args.n_pts, args.n_random, args.n_model)

    print(f"computing exact EMD (scipy LSA, {len(pairs)} pairs of "
          f"{args.n_pts} pts) ...", flush=True)
    exact = {}
    for name, x, y in pairs:
        t0 = time.time()
        exact[name] = exact_emd(x, y)
        print(f"  {name:22s} exact={exact[name]:.6f} "
              f"({time.time() - t0:.1f}s)", flush=True)

    configs = [(args.eps, args.n_iters)]
    if args.sweep:
        configs = [
            (0.01, 100), (0.01, 200), (0.005, 100), (0.005, 200),
            (0.002, 200), (0.002, 300), (0.001, 300),
        ]

    results = {}
    for eps, iters in configs:
        errs = {}
        for name, x, y in pairs:
            v = float(jax.device_get(sinkhorn_emd(
                x[None], y[None], eps=eps, n_iters=iters
            ))[0])
            errs[name] = (v - exact[name]) / exact[name]
        rel = np.array(list(errs.values()))
        results[(eps, iters)] = errs
        print(f"\neps={eps} n_iters={iters}: rel err "
              f"max={np.abs(rel).max():.4%} mean={np.abs(rel).mean():.4%} "
              f"(signed mean {rel.mean():+.4%})")
        for name, e in errs.items():
            print(f"  {name:22s} rel={e:+.4%}")

    out = {
        "n_pts": args.n_pts,
        "pairs": len(pairs),
        "exact": exact,
        "rel_err": {
            f"eps={e}_iters={i}": {k: round(v, 6) for k, v in errs.items()}
            for (e, i), errs in results.items()
        },
    }
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
