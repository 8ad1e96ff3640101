"""Point-axis ('sp') sharding — clouds larger than one chip.

The reference hardcodes 2048-point clouds and single-GPU kernels
(Kaolin chamfer, ``src/models/utils.py``); every distance/encode op
assumes the whole cloud is device-resident. This module shards the
POINT axis over a mesh axis so clouds scale past one chip's HBM/VMEM:
the missing member of the parallel family (dp = episodes, mp = decoder
clusters, fsdp = state, sp = points — the "long-context" axis of this
workload, SURVEY.md §5 item 6 taken to multi-chip).

Design: a ring algorithm under ``shard_map``. Each device holds an
``N/sp`` shard of both clouds; the y shard travels the ring
(``lax.ppermute``) with its running per-point minimum riding along,
while each device accumulates the running minimum for its resident x
shard — after ``sp`` steps every x point has seen every y block (and
every y block is home, minimized over every x block). Distances per
visit are one ``(nx/sp, ny/sp)`` MXU matmul tile (`ops/pairwise`), so
compute stays on the MXU while the ICI transfer of the next block
overlaps (XLA pipelines ppermute against the dominant matmul). The
full ``(N, M)`` cost matrix never exists — neither in HBM nor across
the mesh. Communication volume per direction: ``sp`` hops of the
``(B, M/sp, 3)`` block + its ``(B, M/sp)`` running min — ~B*M*16
bytes total over ICI, independent of N.

Gradients flow by AD through the ring (``ppermute`` transposes to the
reverse rotation); each step is ``jax.checkpoint``-wrapped so the
backward recomputes its distance tile instead of storing ``sp`` of
them. Tie routing differs from the Kaolin-parity kernel's FIRST-min
rule (AD through ``min``/``minimum`` picks its own subgradient);
exact ties are measure-zero in training data.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fpsg_tpu.ops.pairwise import pairwise_sqdist


def ring_nn_sq(x_loc: jax.Array, y_loc: jax.Array, axis_name: str
               ) -> Tuple[jax.Array, jax.Array]:
    """Bidirectional nearest-neighbor squared distances, point-sharded.

    Call INSIDE ``shard_map`` over ``axis_name``. ``x_loc``:
    ``(B, nx_loc, D)`` local shard of x; ``y_loc``: ``(B, ny_loc, D)``
    local shard of y. Returns ``(min_x, min_y_loc)``: for every LOCAL
    x point its squared distance to the nearest GLOBAL y point, and
    for every LOCAL y point its squared distance to the nearest GLOBAL
    x point.
    """
    sp = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

    @jax.checkpoint
    def step(carry, _):
        y_blk, m_yb, m_x = carry
        d = pairwise_sqdist(x_loc, y_blk)          # (B, nx, nyb) f32
        m_x = jnp.minimum(m_x, jnp.min(d, axis=-1))
        m_yb = jnp.minimum(m_yb, jnp.min(d, axis=-2))
        y_blk = jax.lax.ppermute(y_blk, axis_name, perm)
        m_yb = jax.lax.ppermute(m_yb, axis_name, perm)
        return (y_blk, m_yb, m_x), None

    b, nx = x_loc.shape[0], x_loc.shape[1]
    ny = y_loc.shape[1]
    init = (y_loc,
            jnp.full((b, ny), big, jnp.float32),
            jnp.full((b, nx), big, jnp.float32))
    (y_back, m_y, m_x), _ = jax.lax.scan(step, init, None, length=sp)
    del y_back  # home again after sp rotations
    return m_x, m_y


def ring_chamfer(x_loc: jax.Array, y_loc: jax.Array, axis_name: str,
                 w1: float = 1.0, w2: float = 1.0) -> jax.Array:
    """Global symmetric Chamfer distance ``(B,)`` from local point
    shards (inside ``shard_map``; replicated result). Matches
    ``ops.chamfer.chamfer_distance`` on the gathered clouds (equal
    shard sizes make the pmean-of-local-means the global mean)."""
    m_x, m_y = ring_nn_sq(x_loc, y_loc, axis_name)
    per_b = (w1 * jnp.mean(m_x, axis=-1)
             + w2 * jnp.mean(m_y, axis=-1))        # (B,), local means
    return jax.lax.pmean(per_b, axis_name)


def chamfer_distance_sp(x: jax.Array, y: jax.Array, mesh: Mesh,
                        axis_name: str = "sp",
                        w1: float = 1.0, w2: float = 1.0) -> jax.Array:
    """User-facing wrapper: shard the point axes of ``x (B, N, D)`` /
    ``y (B, M, D)`` over ``mesh[axis_name]`` and run the ring. N and M
    must divide by the axis size (pad-and-mask ragged clouds upstream,
    as `ops.chamfer.masked_chamfer_distance` does)."""
    from jax import shard_map

    spec = P(None, axis_name, None)
    fn = shard_map(
        functools.partial(ring_chamfer, axis_name=axis_name,
                          w1=w1, w2=w2),
        mesh=mesh, in_specs=(spec, spec), out_specs=P(),
        check_vma=False,
    )
    return fn(x, y)


# ---------------------------------------------------------------------------
# Point-sharded kNN aggregation (sp-DGCNN)
# ---------------------------------------------------------------------------

def ring_knn_aggregate(x_loc: jax.Array, z_loc: jax.Array, k: int,
                       axis_name: str):
    """EdgeConv neighbor aggregates over the GLOBAL kNN graph, from
    point shards (inside ``shard_map``). Matches
    ``ops.edgeconv.knn_aggregate_oracle`` on the gathered cloud.

    Two ring passes (``2*sp`` hops of the ``(B, n/sp, C+F)`` block):

    1. **Threshold pass** — the visiting coordinate block updates a
       running top-k of squared distances per LOCAL point; after ``sp``
       rotations the k-th smallest distance is each point's kNN
       threshold. Small carry: ``(B, n_loc, k)`` f32.
    2. **Aggregate pass** — re-rotate ``(coords, z)``; the boolean mask
       ``d <= thresh`` IS the neighbor-membership matrix, so ``sum_z``/
       ``sum_zsq`` are mask @ z matmuls (MXU — the same masks-as-gather
       trick as the fused edgeconv kernel) and max/min are masked
       block reduces. The full ``(N, N)`` graph never exists anywhere.

    Gradients flow to ``z`` only (the oracle's neighbor indices carry
    no gradient either; both passes see ``stop_gradient(x)``).

    Both passes are UNROLLED python loops, deliberately: wrapping the
    ring step in ``lax.scan`` or ``jax.checkpoint`` mis-routes max/min
    cotangents to the wrong ring step at some shapes (jax 0.8,
    measured: conserved-but-misrouted z-grads at B=2, n=128, F=16,
    sp>=2; exact when unrolled — see
    tests/test_sp_dgcnn.py::test_ring_knn_aggregate_grads_match_oracle,
    which pins the working form). ``sp`` is a static mesh size, so the
    unroll is bounded and known at trace time.

    Tie caveat: points EXACTLY at the k-th distance are all included
    (the oracle breaks such ties by gathered index order). Exact ties
    are measure-zero for real clouds but systematic for DUPLICATED
    points (e.g. padded clouds) — don't point-shard padded clouds.
    """
    sp = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    x_loc = jax.lax.stop_gradient(x_loc)
    b, n_loc = x_loc.shape[0], x_loc.shape[1]
    f = z_loc.shape[-1]
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

    # --- pass 1: k-th smallest squared distance per local point -------
    run = jnp.full((b, n_loc, k), big, jnp.float32)
    y_blk = x_loc
    for _ in range(sp):
        d = pairwise_sqdist(x_loc, y_blk)              # (B, nl, nb)
        merged = jnp.concatenate([run, d], axis=-1)
        run = -jax.lax.top_k(-merged, k)[0]            # k smallest
        y_blk = jax.lax.ppermute(y_blk, axis_name, perm)
    thresh = jax.lax.stop_gradient(run[..., -1])       # (B, nl)

    # --- pass 2: masked aggregates over the ring ----------------------
    neg = jnp.asarray(-jnp.inf, jnp.float32)
    zeros = jnp.zeros((b, n_loc, f), jnp.float32)
    z_max, z_min = jnp.full_like(zeros, neg), jnp.full_like(zeros, -neg)
    sum_z, sum_zsq = zeros, zeros
    y_blk, z_blk = x_loc, z_loc.astype(jnp.float32)
    for _ in range(sp):
        d = pairwise_sqdist(x_loc, y_blk)              # (B, nl, nb)
        m = (d <= thresh[..., None])
        mf = m.astype(jnp.float32)
        sum_z = sum_z + jnp.einsum("bnm,bmf->bnf", mf, z_blk)
        sum_zsq = sum_zsq + jnp.einsum("bnm,bmf->bnf", mf,
                                       z_blk * z_blk)
        sel = jnp.where(m[..., None], z_blk[:, None, :, :], neg)
        z_max = jnp.maximum(z_max, jnp.max(sel, axis=2))
        sel = jnp.where(m[..., None], z_blk[:, None, :, :], -neg)
        z_min = jnp.minimum(z_min, jnp.min(sel, axis=2))
        y_blk = jax.lax.ppermute(y_blk, axis_name, perm)
        z_blk = jax.lax.ppermute(z_blk, axis_name, perm)
    return z_max, z_min, sum_z, sum_zsq
