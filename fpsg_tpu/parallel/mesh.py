"""Mesh construction and sharding rules.

Design (SURVEY.md §2.6): a 2-D ``Mesh(('dp', 'mp'))``.

- ``dp`` shards the episode batch axis of each train step — pure data
  parallelism; the mean over episode gradients becomes an ICI all-reduce.
- ``mp`` (optional, size 1 by default) shards the decoder's stacked
  primitive weights along the cluster axis: the 16 primitive-node MLPs are
  embarrassingly parallel, so cluster-sharding the (C, Nn, d_in, d_out)
  kernels splits both the 62 M decoder params and their FLOPs with no
  communication except the final point concat (an all-gather of (B, 2048/mp,
  3) — tiny).

Everything is expressed as NamedSharding annotations under ``jax.jit``; XLA
inserts the collectives (no hand-written NCCL analog anywhere).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, mp) mesh; dp defaults to n_devices // mp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // mp
    assert dp * mp <= n, (dp, mp, n)
    arr = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


def replicate(tree, mesh: Mesh):
    """Fully-replicated placement of a pytree on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def _is_cluster_stacked(path: str, leaf) -> bool:
    """Decoder stacked parameters: leading axis = num_clusters."""
    return (
        "pc_decoder" in path
        and ("node_conv" in path or "deformer_conv" in path)
    )


def param_sharding_rules(params, mesh: Mesh):
    """NamedSharding tree for params: decoder stacked weights along 'mp',
    everything else replicated."""

    def rule(path, leaf):
        keys = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        if _is_cluster_stacked(keys, leaf) and leaf.ndim >= 2:
            spec = ("mp",) + (None,) * (leaf.ndim - 1)
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def fsdp_state_sharding(state, mesh: Mesh, min_size: int = 65536):
    """FSDP/ZeRO-style sharding tree for a whole TrainState.

    Every large leaf (params AND Adam moments — the moments dominate
    optimizer HBM at 2x params) is sharded along ``dp`` on its first
    dimension divisible by the dp size; small leaves (biases, BN stats,
    counters) stay replicated — sharding them buys nothing and costs a
    collective each. Under ``jax.jit`` with these as in/out shardings,
    GSPMD inserts the FSDP communication pattern automatically: params
    all-gather where the episode compute needs them whole, their
    cotangents reduce-scatter back to the shard, and the Adam update
    runs shard-local. Per-device state memory drops ~dp-fold for the
    sharded leaves (the 80 M-param flagship carries 960 MB of
    params+moments f32 — 120 MB/device on an 8-way mesh).

    Composes with the decoder ``mp`` rules: cluster-stacked decoder
    weights keep their 'mp' axis (sharding the same tensor on both axes
    is possible but the cluster axis already cuts them mp-fold).
    """
    dp = mesh.shape["dp"]
    rep = NamedSharding(mesh, P())

    def rule(path, leaf):
        keys = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        if _is_cluster_stacked(keys, leaf) and getattr(leaf, "ndim", 0) >= 2:
            if mesh.shape.get("mp", 1) > 1:
                spec = ("mp",) + (None,) * (leaf.ndim - 1)
                return NamedSharding(mesh, P(*spec))
        if getattr(leaf, "size", 0) >= min_size:
            for i, d in enumerate(leaf.shape):
                if d >= dp and d % dp == 0:
                    spec = [None] * leaf.ndim
                    spec[i] = "dp"
                    return NamedSharding(mesh, P(*spec))
        return rep

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_train_state(state, mesh: Mesh, model_parallel: bool = False,
                      fsdp: bool = False):
    """Place a TrainState on the mesh.

    Params are mp-sharded per :func:`param_sharding_rules` when
    ``model_parallel``; batch_stats and opt_state start replicated — inside
    the jitted step the optimizer update is elementwise in the params, so
    XLA propagates the param sharding onto the Adam moments after the first
    step (their out-shardings follow the params).

    ``fsdp=True`` instead shards params and optimizer moments dp-wise per
    :func:`fsdp_state_sharding` (pass the same tree to
    ``make_train_step(state_shardings=...)`` so the step keeps them
    sharded at exit).
    """
    if fsdp:
        return jax.device_put(state, fsdp_state_sharding(state, mesh))
    if not model_parallel:
        return replicate(state, mesh)
    rep = NamedSharding(mesh, P())
    return state.replace(
        params=jax.device_put(
            state.params, param_sharding_rules(state.params, mesh)
        ),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep),
    )


def shard_episode_batch(batch, mesh: Mesh):
    """Shard the leading episode axis over 'dp' (images/clouds replicated
    in every other dim)."""

    def rule(leaf):
        spec = ("dp",) + (None,) * (leaf.ndim - 1)
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(rule, batch)
