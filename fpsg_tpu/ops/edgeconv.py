"""Fused kNN + neighbor aggregation for EdgeConv, TPU-native.

The decomposed EdgeConv (nn/dgcnn.py) needs, per point i, four
aggregates of Z over i's k nearest neighbors: max, min, sum, sum-of-
squares. The XLA route — kNN indices → row gather → reduces — is
gather/scatter-bound on TPU: the (B·N·k, F) gather runs at ~58 GB/s and
its backward scatter-add at ~4 GB/s (measured, BASELINE.md r3 DGCNN
section). This kernel never touches HBM with indices:

  per row tile: the pairwise-distance block is computed on the MXU
  (chamfer/kNN tile machinery), the k nearest are extracted by
  iterative min + masked-iota argmin (plain reduces — the r2 finding
  that variadic (value, index) reduces are ~3x slower), and each
  round's selection mask — already in registers — plays the role of a
  one-hot gather: G_r = mask_r @ Z on the MXU. Max/min/sum/sumsq
  accumulate in VMEM; the backward replays the extraction and routes
  cotangents with transposed mask matmuls (dZ += mask_r^T @ cot_r),
  accumulated in a VMEM-resident (N, F) block.

Selection order matches the reference topk exactly (first-minimal ties);
max/min backward ties route to the FIRST extracted neighbor achieving
the extreme (XLA's reduce-max splits ties evenly — indistinguishable in
practice; ties between distinct neighbors require duplicated points).
Distances carry no gradient (the reference's topk indices are equally
non-differentiable).

Reference: ``src/dgcnn/model.py:13-42`` (knn + get_graph_feature).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops._pallas_utils import interpret_default, round_up

_BIG = 1e30


def _dist_block(xq, xa):
    xq_sq = jnp.sum(xq * xq, axis=1, keepdims=True)
    xa_sq = jnp.sum(xa * xa, axis=1, keepdims=True)
    cross = jax.lax.dot_general(
        xq, xa, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(xq_sq - 2.0 * cross + xa_sq.T, 0.0)


def _extract_mask(d, cols):
    """One selection round: first-minimal mask (TN, N) + masked d."""
    dmin = jnp.min(d, axis=1, keepdims=True)
    # first index attaining the min (plain reduces, torch/topk tie rule)
    masked = jnp.where(d == dmin, cols, d.shape[1])
    arg = jnp.min(masked, axis=1, keepdims=True)
    mask = cols == arg
    return mask, jnp.where(mask, _BIG, d)


def _agg_fwd_kernel_factory(k: int, tile_n: int):
    # Loop structure: fori over the k rounds with the masked distance
    # matrix as the ONLY carry; the four accumulators live in VMEM
    # scratch (Mosaic fails to legalize an scf.for with five wide vector
    # carries, and a static unroll keeps every round's intermediates
    # live — measured 47M VMEM stack at F=256).
    def kernel(xq_ref, xa_ref, z_ref, mx_ref, mn_ref, sm_ref, sq_ref,
               idx_ref, acc_ref, iacc_ref):
        d = _dist_block(xq_ref[0], xa_ref[0])
        z = z_ref[0]                                    # (N, F)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k), 1)
        f = z.shape[1]

        acc_ref[0] = jnp.full((tile_n, f), -_BIG, jnp.float32)
        acc_ref[1] = jnp.full((tile_n, f), _BIG, jnp.float32)
        acc_ref[2] = jnp.zeros((tile_n, f), jnp.float32)
        acc_ref[3] = jnp.zeros((tile_n, f), jnp.float32)
        iacc_ref[:] = jnp.zeros((tile_n, k), jnp.int32)

        def round_(r, d):
            dmin = jnp.min(d, axis=1, keepdims=True)
            masked = jnp.where(d == dmin, cols, d.shape[1])
            arg = jnp.min(masked, axis=1, keepdims=True)
            mask = cols == arg
            d = jnp.where(mask, _BIG, d)
            g = jax.lax.dot_general(
                mask.astype(z.dtype), z, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[0] = jnp.maximum(acc_ref[0], g)
            acc_ref[1] = jnp.minimum(acc_ref[1], g)
            acc_ref[2] += g
            acc_ref[3] += g * g
            # record the selected index for the backward replay
            iacc_ref[:] = jnp.where(out_cols == r, arg, iacc_ref[:])
            return d

        jax.lax.fori_loop(0, k, round_, d)
        mx_ref[0] = acc_ref[0]
        mn_ref[0] = acc_ref[1]
        sm_ref[0] = acc_ref[2]
        sq_ref[0] = acc_ref[3]
        idx_ref[0] = iacc_ref[:]

    return kernel


def _agg_bwd_kernel_factory(k: int, tile_n: int):
    """Replay extraction; dZ += mask_r^T @ cot_r per round.

    cot_r = [first-max routing]*gmax + [first-min routing]*gmin
            + gsum + 2*G_r*gsq.
    """

    def kernel(idx_ref, z_ref, mx_ref, mn_ref,
               gmx_ref, gmn_ref, gsm_ref, gsq_ref, dz_ref, routed_ref):
        t = pl.program_id(1)
        z = z_ref[0]
        n = z.shape[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_n, n), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_n, k), 1)
        idx = idx_ref[0]                                  # (TN, k)
        f = z.shape[1]
        mx = mx_ref[0]
        mn = mn_ref[0]
        gmx = gmx_ref[0].astype(jnp.float32)
        gmn = gmn_ref[0].astype(jnp.float32)
        gsm = gsm_ref[0].astype(jnp.float32)
        gsq = gsq_ref[0].astype(jnp.float32)

        @pl.when(t == 0)
        def _():
            dz_ref[0] = jnp.zeros_like(dz_ref[0])

        routed_ref[0] = jnp.zeros((tile_n, f), jnp.float32)  # max routed
        routed_ref[1] = jnp.zeros((tile_n, f), jnp.float32)  # min routed

        def round_(r, carry):
            # round r's selected index, via a masked lane reduce (dynamic
            # lane slicing needs 128-alignment; this doesn't slice)
            arg = jnp.sum(
                jnp.where(lane == r, idx, 0), axis=1, keepdims=True)
            mask = cols == arg
            g = jax.lax.dot_general(
                mask.astype(z.dtype), z, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # exact-recompute equality: g is produced by the identical
            # mask@Z product as the forward, so the extreme compare is
            # bitwise; the FIRST extracted neighbor achieving the extreme
            # gets the cotangent (routed flags as 0/1 f32 in scratch)
            hit_mx = jnp.where(g >= mx, 1.0, 0.0) * (1.0 - routed_ref[0])
            hit_mn = jnp.where(g <= mn, 1.0, 0.0) * (1.0 - routed_ref[1])
            cot = hit_mx * gmx + hit_mn * gmn + gsm + 2.0 * g * gsq
            dz_ref[0] += jax.lax.dot_general(
                mask.astype(cot.dtype), cot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            routed_ref[0] = jnp.maximum(routed_ref[0], hit_mx)
            routed_ref[1] = jnp.maximum(routed_ref[1], hit_mn)
            return carry

        jax.lax.fori_loop(0, k, round_, 0)

    return kernel


def _pad_feat(x: jax.Array) -> Tuple[jax.Array, int]:
    c = x.shape[-1]
    cp = round_up(max(c, 8), 8 if c <= 8 else 128)
    if cp != c:
        x = jnp.pad(x.astype(jnp.float32), ((0, 0),) * (x.ndim - 1)
                    + ((0, cp - c),))
    else:
        x = x.astype(jnp.float32)
    return x, cp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def knn_aggregate(x, z, k: int, tile_n: int = 256):
    """Per-point neighbor aggregates of ``z`` over the k nearest (by
    ``x``) points: returns (max, min, sum, sumsq), each ``(B, N, F)`` f32.

    x: (B, N, C) features defining the kNN graph (no gradient).
    z: (B, N, F) values to aggregate (F a multiple of 128, or it is
       zero-padded here).
    """
    return _knn_aggregate_fwd_impl(x, z, k, tile_n)[0]


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def _knn_aggregate_fwd_impl(x, z, k, tile_n):
    b, n, _ = x.shape
    f = z.shape[-1]
    tile_n = min(tile_n, n)
    while n % tile_n != 0:
        tile_n //= 2
    xp, cp = _pad_feat(jax.lax.stop_gradient(x))
    fp = round_up(f, 128)
    zp = z if fp == f else jnp.pad(z, ((0, 0), (0, 0), (0, fp - f)))

    *outs, idx = pl.pallas_call(
        _agg_fwd_kernel_factory(k, tile_n),
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, cp), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, fp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n, fp), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)
        ] * 4 + [
            pl.BlockSpec((1, tile_n, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, fp), jnp.float32)
        ] * 4 + [jax.ShapeDtypeStruct((b, n, k), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((4, tile_n, fp), jnp.float32),
                        pltpu.VMEM((tile_n, k), jnp.int32)],
        interpret=interpret_default(),
    )(xp, xp, zp)
    if fp != f:
        outs = [o[..., :f] for o in outs]
    return tuple(outs), idx


def _knn_aggregate_vjp_fwd(x, z, k, tile_n):
    (mx, mn, sm, sq), idx = _knn_aggregate_fwd_impl(x, z, k, tile_n)
    return (mx, mn, sm, sq), (idx, z, mx, mn, x)


@functools.partial(jax.jit, static_argnames=("k", "tile_n"))
def _knn_aggregate_bwd_impl(idx, z, mx, mn, gmx, gmn, gsm, gsq, k, tile_n):
    b, n, _ = idx.shape
    f = z.shape[-1]
    # the bwd kernel carries more per-tile state (routed flags, six
    # cotangent tiles, the dz block): 128 rows keeps the wide-F case
    # inside the 16 MB VMEM scope (256 rows measured 16.7M at F=256)
    tile_n = min(tile_n, n, 128)
    while n % tile_n != 0:
        tile_n //= 2
    fp = round_up(f, 128)

    def padf(t):
        return t if fp == f else jnp.pad(
            t, ((0, 0), (0, 0), (0, fp - f)))

    zp = padf(z)
    # padded channels carry zero cotangent and +-BIG extremes so padded
    # lanes never route
    mxp = padf(mx) if fp == f else jnp.pad(
        mx, ((0, 0), (0, 0), (0, fp - f)), constant_values=_BIG)
    mnp = padf(mn) if fp == f else jnp.pad(
        mn, ((0, 0), (0, 0), (0, fp - f)), constant_values=-_BIG)

    dz = pl.pallas_call(
        _agg_bwd_kernel_factory(k, tile_n),
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, k), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, fp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, tile_n, fp), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM)
        ] * 6,
        out_specs=pl.BlockSpec((1, n, fp), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, fp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tile_n, fp), jnp.float32)],
        interpret=interpret_default(),
    )(idx, zp, mxp, mnp, padf(gmx), padf(gmn), padf(gsm), padf(gsq))
    if fp != f:
        dz = dz[..., :f]
    return dz.astype(z.dtype)


def _knn_aggregate_vjp_bwd(k, tile_n, res, cots):
    idx, z, mx, mn, x = res
    gmx, gmn, gsm, gsq = cots
    dz = _knn_aggregate_bwd_impl(
        idx, z, mx, mn, gmx, gmn, gsm, gsq, k, tile_n
    )
    return jnp.zeros_like(x), dz


knn_aggregate.defvjp(_knn_aggregate_vjp_fwd, _knn_aggregate_vjp_bwd)


def knn_aggregate_oracle(x, z, k: int):
    """jnp reference: gather + reduces (the correctness oracle, and the
    CPU execution path)."""
    from fpsg_tpu.ops.knn import knn_indices

    idx = knn_indices(x, k=k)
    zn = jnp.take_along_axis(z[:, :, None, :], idx[..., None], axis=1)
    znf = zn.astype(jnp.float32)
    return (
        jnp.max(znf, axis=2),
        jnp.min(znf, axis=2),
        jnp.sum(znf, axis=2),
        jnp.sum(znf * znf, axis=2),
    )
