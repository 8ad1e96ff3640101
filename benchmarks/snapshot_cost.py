"""Measure the transient-retry snapshot cost: a full device→host
TrainState pull (jax.device_get) at the flagship config.

The train loop takes one such snapshot every ``snapshot_interval`` epochs
(train/loop.py); this prints the pull time and its share of an epoch at
the measured headline rate so the default interval is a measured choice,
not a guess.

Run from /root/repo with no PYTHONPATH (CLAUDE.md axon quirks):
    python benchmarks/snapshot_cost.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from fpsg_tpu.config import FPSGConfig
from fpsg_tpu.train.loop import build_model, make_state


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_fpsg")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    conf = FPSGConfig(
        dataset="synthetic", img_encoder="vgg_16", pc_encoder="pointnet",
        compute_dtype="bf16",
    )
    model = build_model(conf)
    # The measurement only needs a TPU-resident state of the production
    # shapes/dtypes — get them abstractly (no init compile, no Pallas
    # dispatch) and upload zeros.
    import numpy as np

    shapes = jax.eval_shape(lambda: make_state(model, conf, img_size=224)[0])
    dev = jax.devices()[0]
    state = jax.tree.map(
        lambda s: jax.device_put(np.zeros(s.shape, s.dtype), dev), shapes)

    n_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(state)
    )
    # drain the upload queue first (device reads are the only reliable
    # sync on axon), then time ONE pull: jax caches the host copy of an
    # unchanged array, so a second device_get of the same state is free
    # (measured: 38 s then 7 ms) — in the train loop every snapshot pulls
    # NEW arrays, so the first-pull number is the real per-snapshot cost.
    jax.device_get([x.ravel()[0] for x in jax.tree.leaves(state)])
    t0 = time.perf_counter()
    host = jax.device_get(state)
    pull = time.perf_counter() - t0
    del host
    print(f"state size: {n_bytes / 1e6:.1f} MB "
          f"({sum(x.size for x in jax.tree.leaves(state)) / 1e6:.1f} M elems)")
    print(f"device_get: {pull * 1e3:.0f} ms "
          f"({n_bytes / pull / 1e9:.3f} GB/s)")
    # headline epoch = 100 episodes at the measured eps (BASELINE.md)
    for eps in (18.7,):
        epoch_s = 100.0 / eps
        print(f"@ {eps} eps, 100-episode epoch = {epoch_s:.2f} s → "
              f"per-snapshot overhead {pull / epoch_s * 100:.0f}% of an "
              f"epoch → auto interval "
              f"{max(1, int(np.ceil(pull / (0.02 * epoch_s))))} epochs "
              f"(2% rule, train/loop.py)")


if __name__ == "__main__":
    main()
