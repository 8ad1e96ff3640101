#!/usr/bin/env python
"""Benchmark: episodes/sec for flagship FPSG training on TPU.

Config matches the reference's headline setting (BASELINE.json): ModelNet
1-way 32-shot episodic training with --intra_recon — VGG16-bn image branch,
PointNet shape-prior branch, 4x4 primitive decoder, 2048-point clouds,
Chamfer loss, Adam. One measured unit = one episode (one optimizer step at
E=1; E>1 batches episodes and counts each).

Prints ONE json line:
  {"metric": "episodes_per_sec_modelnet_1way_32shot_intra",
   "value": ..., "unit": "episodes/s", "vs_baseline": ...,
   "mfu": ..., "step_tflop_executed": ..., ...}

vs_baseline: ratio to the ESTIMATED reference throughput on its intended
hardware — a CUDA GPU sustaining an optimistic 20 TFLOP/s effective on
the ~3 TFLOP reference step would reach ~6.7 episodes/s if perfectly
compute-bound (BASELINE.md "defensible comparisons"); the reference
additionally pays 16 Python-loop decoder dispatches and per-episode CPU
episode assembly + H2D copies, so this ratio UNDERSTATES the speedup.
The directly *measured* but much weaker comparison (the faithful torch
re-implementation on this host's CPU, benchmarks/baseline_torch.py) is
reported separately as vs_torch_cpu_measured — provenance only.
mfu: measured model-FLOP utilization against the v5e bf16 peak, using
executed FLOPs from XLA's own cost analysis of the compiled step.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Estimated reference throughput on its intended hardware (see module
# docstring + BASELINE.md): ~3 TFLOP/step at an optimistic 20 TFLOP/s.
GPU_ESTIMATE_BASELINE_EPS = 6.7

# Measured by benchmarks/baseline_torch.py (torch CPU, this host,
# 2026-08-16: 106 s/step — the step is ~3 TFLOP).
# Refresh with: python bench.py --measure-baseline
TORCH_CPU_BASELINE_EPS = 0.0094

# Peak bf16 matmul throughput of one TPU v5e chip (public spec: 197
# TFLOP/s bf16).
V5E_BF16_PEAK_TFLOPS = 197.0

# Analytic model FLOPs of one optimizer step (fwd+bwd) of the headline
# config, in TFLOP. Derivation (BASELINE.md breakdown): VGG16-bn on 33
# images ~0.51 TF fwd x3 (fwd+dgrad+wgrad) = 1.53; PointNet on 64x2048
# clouds ~0.1; decoder (two passes, conditioning matmul hoisted out of
# the point dim) ~0.6; chamfer/losses/optimizer ~0.07 => ~2.3 TF. This is
# the ALGORITHMIC count of our step (the reference executes ~3 TF for the
# same math — its decoder re-multiplies the conditioning per point).
# XLA's cost_analysis cannot be used here: the decoder/chamfer FLOPs run
# inside Pallas kernels it does not model, and the space-to-depth conv
# padding FLOPs are waste that should not count toward utilization.
MODEL_STEP_TFLOP = 2.3

# Same accounting with pc_backbone=dgcnn (--pc-backbone dgcnn).
# DGCNN encoder on the 65x2048 episode clouds, k=20: the decomposed
# EdgeConv applies each conv ONCE per point (nn/dgcnn.py — FLOPs do not
# scale with k): matmuls [Z||U] 133k-pts x (3->128, 64->128, 64->256,
# 128->512) + conv5 512->512 ~0.094 TF fwd x3 = 0.28; kNN pairwise
# x@x^T per layer ~0.14 TF (fwd only, index backward is a replay);
# VGG 1.53 + decoder 0.6 + misc 0.07 => ~2.6 TF. The dgcnn step is
# gather/bandwidth-bound, so MFU against this count is expected low.
MODEL_STEP_TFLOP_DGCNN = 2.6


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_fpsg")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without these flags


def measure_ours(n_episodes: int, steps: int, warmup: int,
                 compute_dtype: str = "bf16",
                 steps_per_call: int = 8,
                 fused_conv: bool = False,
                 winograd: bool = False,
                 bf16_moments: bool = False,
                 pc_backbone: str = "pointnet",
                 pc_dist: str = "cd",
                 host_corpus: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from fpsg_tpu.data import (
        DeviceCorpus, synthetic_corpus, synthetic_device_corpus,
    )
    from fpsg_tpu.train.retry import is_transient_backend_error
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.train import (
        TrainState, init_model, make_optimizer, make_train_step,
    )

    n_support, n_query, n_pts, img = 32, 1, 2048, 224
    model = ImgPCProtoNet(
        img_backbone="vgg_16",
        pc_backbone=pc_backbone,
        metric=pc_dist,
        intra_support=True,
        dtype=jnp.bfloat16 if compute_dtype == "bf16" else None,
        fused_conv=fused_conv,
        winograd=winograd,
    )
    if host_corpus:
        # legacy host-generated path (~30 MB of H2D through the tunnel —
        # the exact transfer BENCH_r04 died in; kept for A/B validation)
        corpus = DeviceCorpus.build(
            synthetic_corpus(n_classes=2, items_per_class=48, n_pts=n_pts,
                             img_size=img)
        )
    else:
        # on-device generation: the bench preamble's H2D traffic is one
        # PRNG key + the compiled programs (degraded-phase armor,
        # VERDICT r4 item 2)
        corpus = synthetic_device_corpus(
            n_classes=2, items_per_class=48, n_pts=n_pts, img_size=img)
    sample = {
        "xs": jnp.zeros((n_support, img, img, 3)),
        "xq": jnp.zeros((n_query, img, img, 3)),
        "xad": jnp.zeros((n_support, img, img, 3)),
        "pcs": jnp.zeros((n_support, n_pts, 3)),
        "pcq": jnp.zeros((n_query, n_pts, 3)),
        "pcad": jnp.zeros((n_support, n_pts, 3)),
    }
    variables = init_model(model, sample)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=100,
                        bf16_moments=bf16_moments)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    # K optimizer steps per dispatch (lax.scan; identical update
    # sequence): amortizes the ~3.5 ms/dispatch axon host overhead.
    step = make_train_step(
        model, tx, n_support=n_support, n_query=n_query,
        n_episodes=n_episodes, steps_per_call=steps_per_call,
    )

    def sync(metrics):
        # device->host read: block_until_ready alone does not reliably
        # drain the execution queue on the axon TPU platform. The read
        # is side-effect-free — retry it through INVALID_ARGUMENT
        # bursts (degraded-phase armor; see the retry loop in main).
        last = None
        for attempt in range(4):
            try:
                return float(jax.device_get(
                    metrics["query_rec_loss"]).sum())
            except Exception as exc:  # noqa: BLE001 — backend flake
                if not is_transient_backend_error(exc):
                    raise
                last = exc
                time.sleep(5.0 * (attempt + 1))
        raise last

    key = jax.random.PRNGKey(0)
    for i in range(warmup):
        state, metrics = step(state, corpus, jax.random.fold_in(key, i))
    sync(metrics)

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, corpus, jax.random.fold_in(key, 100 + i))
    sync(metrics)
    dt = time.perf_counter() - t0
    return n_episodes * steps_per_call * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes-per-step", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--steps-per-call", type=int, default=8,
                    help="optimizer steps fused per dispatch (lax.scan)")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--quick", action="store_true",
                    help="short leg for degraded-phase attempts: 5 "
                         "measured steps, 1 warmup (same compiled "
                         "program — steps_per_call unchanged, so the "
                         "compile cache still hits)")
    ap.add_argument("--host-corpus", action="store_true",
                    help="generate the synthetic corpus on the host and "
                         "upload it (legacy path; default generates it "
                         "on-device so the bench preamble is near-"
                         "transfer-free)")
    ap.add_argument("--measure-baseline", action="store_true",
                    help="re-measure the torch-CPU reference baseline")
    ap.add_argument("--fused-conv", dest="fused_conv",
                    action="store_true", default=False,
                    help="run the VGG branch through the fused Pallas "
                         "conv+BN chain (A/B; measured slower — "
                         "BASELINE.md round-3e)")
    ap.add_argument("--no-fused-conv", dest="fused_conv",
                    action="store_false",
                    help="explicit tensor-path VGG branch (the default)")
    ap.add_argument("--winograd", dest="winograd",
                    action="store_true", default=False,
                    help="Winograd F(2,3) for the unpacked VGG convs "
                         "(A/B; benchmarks/winograd_probe.py decides "
                         "per-site viability)")
    ap.add_argument("--no-winograd", dest="winograd",
                    action="store_false",
                    help="direct XLA convs (the default)")
    ap.add_argument("--bf16-moments", dest="bf16_moments",
                    action="store_true", default=True,
                    help="Adam moments stored bf16 (the perf-config "
                         "default, like bf16 compute: half the optimizer "
                         "HBM state, +1.6-2.8%% measured; bounded drift)")
    ap.add_argument("--no-bf16-moments", dest="bf16_moments",
                    action="store_false",
                    help="f32 Adam moments (reference-exact optimizer "
                         "state; A/B)")
    ap.add_argument("--compute-dtype", type=str, default="bf16",
                    choices=["f32", "bf16"],
                    help="mixed-precision compute dtype (params/BN stats/"
                         "losses stay f32 either way)")
    ap.add_argument("--pc-backbone", type=str, default="pointnet",
                    choices=["pointnet", "dgcnn"],
                    help="point-cloud encoder backbone (reference "
                         "--pc_encoder, src/trainNetwork.py:226); dgcnn "
                         "reports its own metric line")
    ap.add_argument("--pc-dist", type=str, default="cd",
                    choices=["cd", "emd"],
                    help="training reconstruction metric (the reference "
                         "flag it parses but drops, src/trainNetwork.py"
                         ":250); emd reports its own metric line")
    ap.add_argument("--inner", action="store_true",
                    help="internal: single-attempt worker mode (the "
                         "outer process spawns fresh workers — the "
                         "degraded-phase INVALID_ARGUMENT flake poisons "
                         "a process's backend once it hits, so retrying "
                         "in-process cannot recover; a fresh process "
                         "re-rolls the dice and reuses the compile "
                         "cache)")
    args = ap.parse_args()
    if args.quick:
        args.steps = min(args.steps, 5)
        args.warmup = min(args.warmup, 1)

    if not args.inner:
        # Outer mode: fresh subprocess per attempt (see --inner help).
        # The outer NEVER touches the backend itself. Hang protection
        # (the tunnel-down case where backend init blocks forever)
        # lives here too: ONE throwaway probe child up front, then a
        # generous watchdog timeout per worker — the WORKER path stays
        # probe-free, because any extra backend connect/disconnect
        # before the real work correlates with the degraded-phase
        # INVALID_ARGUMENT failures (CLAUDE.md platform quirks).
        import subprocess

        from __graft_entry__ import _count_devices_with_timeout

        if _count_devices_with_timeout(120.0) < 1:
            print("bench.py: TPU backend unreachable (device probe "
                  "timed out/failed) — aborting", file=sys.stderr)
            sys.exit(2)

        last_code = 1
        for attempt in range(4):
            failure = None
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     *sys.argv[1:], "--inner"],
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    capture_output=True, text=True, timeout=3600)
            except subprocess.TimeoutExpired as exc:
                # a hung worker is the STRONGEST degraded-tunnel signal —
                # it gets the same cool-down as other failures, and its
                # partial stderr is forwarded, not discarded
                stderr = exc.stderr
                if isinstance(stderr, bytes):
                    stderr = stderr.decode(errors="replace")
                if stderr:
                    sys.stderr.write(stderr)
                failure = "hung >1h (killed)"
                last_code = 1
                # hang-mode check: when the tunnel is DOWN (vs degraded)
                # every op blocks forever inside the plugin — further
                # workers would burn their full hour each. Re-probe; if
                # devices are unreachable, stop burning the driver's
                # round budget and report tunnel-down (exit 2).
                if _count_devices_with_timeout(120.0) < 1:
                    print("bench.py: worker hung and device probe now "
                          "fails — tunnel down, aborting", file=sys.stderr)
                    sys.exit(2)
            else:
                sys.stderr.write(proc.stderr)
                json_lines = [ln for ln in proc.stdout.splitlines()
                              if ln.startswith("{")]
                if proc.returncode == 0 and json_lines:
                    print(json_lines[-1])
                    return
                failure = f"failed (exit {proc.returncode})"
                last_code = proc.returncode or 1
            print(f"# bench worker attempt {attempt + 1}/4 {failure}; "
                  "cooling down", file=sys.stderr)
            if attempt < 3:
                time.sleep(60.0 * (attempt + 1))
        sys.exit(last_code)

    cpu_baseline = TORCH_CPU_BASELINE_EPS
    if args.measure_baseline:
        from benchmarks.baseline_torch import measure_baseline

        cpu_baseline = measure_baseline(steps=3)
        print(f"# measured torch-CPU baseline: {cpu_baseline:.4f} episodes/s")

    # Transient-failure armor: the axon tunnel has been observed to
    # throw bare `INVALID_ARGUMENT: TPU backend error` on the first
    # device reads for a few minutes after a tunnel restart (2026-08-19:
    # two consecutive failing runs, then clean 17.5+ eps with zero repo
    # changes), and — 2026-08-20 — to enter HOURS-long degraded phases
    # where individual transfers/reads fail with ~tens-of-% probability
    # (small probes pass; corpus uploads, init reads, and metric reads
    # all observed failing in different runs with no repo change).
    # The worker keeps a short in-process retry for the seconds-scale
    # bursts; the outer process handles the poisoned-backend case with
    # fresh workers.
    last_err = None
    for attempt in range(2):
        try:
            eps = measure_ours(
                args.episodes_per_step, args.steps, args.warmup,
                args.compute_dtype, steps_per_call=args.steps_per_call,
                fused_conv=args.fused_conv, winograd=args.winograd,
                bf16_moments=args.bf16_moments,
                pc_backbone=args.pc_backbone, pc_dist=args.pc_dist,
                host_corpus=args.host_corpus)
            break
        except Exception as e:  # noqa: BLE001 — report, cool down, retry
            last_err = e
            print(f"# bench attempt {attempt + 1}/2 failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            if attempt < 1:  # no pointless cool-down after the last try
                import jax

                jax.clear_caches()
                time.sleep(30.0)
    else:
        raise last_err
    dgcnn = args.pc_backbone == "dgcnn"
    step_tflop = MODEL_STEP_TFLOP_DGCNN if dgcnn else MODEL_STEP_TFLOP
    out = {
        "metric": "episodes_per_sec_modelnet_1way_32shot_intra"
                  + ("_dgcnn" if dgcnn else "")
                  + ("_emd" if args.pc_dist == "emd" else ""),
        "value": round(eps, 3),
        "unit": "episodes/s",
        "pc_backbone": args.pc_backbone,
        "pc_dist": args.pc_dist,
        "fused_conv": args.fused_conv,
        "winograd": args.winograd,
        "bf16_moments": args.bf16_moments,
        # estimated reference-on-CUDA throughput (module docstring);
        # understates the speedup (reference dispatch/H2D overheads not
        # modeled). The estimate models the POINTNET step; the reference
        # dgcnn step is strictly larger (its EdgeConv convs scale with
        # k=20 — ours don't), so for dgcnn this ratio understates more.
        "vs_baseline": round(eps / GPU_ESTIMATE_BASELINE_EPS, 2),
        "baseline_provenance": (
            "estimate: reference ~3 TFLOP step at an optimistic "
            "20 TFLOP/s effective on its intended CUDA GPU = "
            f"{GPU_ESTIMATE_BASELINE_EPS} eps; see BASELINE.md"
        ),
        # weak-but-measured provenance ratio (torch on this host's CPU)
        "vs_torch_cpu_measured": round(eps / cpu_baseline, 2),
        "step_tflop_model": step_tflop,
        "mfu": round(eps * step_tflop / V5E_BF16_PEAK_TFLOPS, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
