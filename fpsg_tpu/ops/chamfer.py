"""Chamfer distance, TPU-native.

Replaces Kaolin 0.9's CUDA ``chamfer_distance`` (reference
``src/models/few_shot.py:13,57,110,117,167``; SURVEY.md §2.4 N1). Semantics
match Kaolin: for clouds ``x (B,N,D)`` and ``y (B,M,D)``::

    CD_b = w1 * mean_i min_j ||x_i - y_j||^2  +  w2 * mean_j min_i ||x_i - y_j||^2

returned per batch element, shape ``(B,)`` (the reference then ``.sum()``s).

Two interchangeable implementations:

- **oracle** (pure jnp): materializes the (N, M) squared-distance matrix;
  used as the correctness reference and for CPU tests.
- **pallas**: a tiled kernel that streams (TILE_N, M) distance blocks through
  VMEM, keeping running row-mins and column-mins — the N^2 matrix never
  touches HBM. The cross term is a (TILE_N, D)x(D, M) matmul on the MXU.

Gradients flow through a custom VJP built from the nearest-neighbor indices
(the true derivative of the min), so the backward pass is two gathers and two
segment-sums instead of re-materializing the N^2 matrix.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops.pairwise import pairwise_sqdist
from fpsg_tpu.ops._pallas_utils import interpret_default, pad_points

_BIG = 1e30  # python float: jnp constants would be captured tracers in pallas


# ---------------------------------------------------------------------------
# Oracle nearest neighbor
# ---------------------------------------------------------------------------

def _first_min_index(d: jax.Array, dmin: jax.Array, axis: int) -> jax.Array:
    """First index attaining the minimum along ``axis``.

    Two regimes, both measured (BASELINE.md r2): up to ~4k the masked-iota
    form (two PLAIN reduces) beats XLA's variadic (value, index) reduce by
    ~3x; beyond that the s32 masked matrix lowers pathologically (~20 GB/s
    at N=8192) and the variadic argmin wins. Both return the FIRST minimal
    index (torch/kaolin tie semantics).

    NaN caveat: with all-NaN distances the masked-iota form returns the
    out-of-range fill index ``size`` (NaN != NaN, so no element matches
    dmin); the downstream gather clamps, silently routing gradient to the
    last point, where argmin would return an in-range index. Inputs are
    already degenerate (NaN coordinates) in that regime — acceptable."""
    size = d.shape[axis]
    if size > 4096:
        return jnp.argmin(d, axis=axis).astype(jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis % d.ndim)
    masked = jnp.where(d == jnp.expand_dims(dmin, axis), j, size)
    return jnp.min(masked, axis=axis).astype(jnp.int32)


def _nn_oracle(x: jax.Array, y: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-point nearest squared distance and index: (B,N), (B,N) int32."""
    d = pairwise_sqdist(x, y)
    dmin = jnp.min(d, axis=-1)
    return dmin, _first_min_index(d, dmin, -1)


def _nn_oracle_both(x: jax.Array, y: jax.Array):
    """Both directions, each reduced over the LANE axis (-1).

    The single-matrix form (reduce one direction over axis -2) is
    pathological on TPU: the masked-iota s32 matrix materializes and the
    sublane-axis min runs at ~20 GB/s (measured 100 ms at N=8192 vs 5 ms
    for the transposed formulation). Two pairwise matmuls are far cheaper
    than one cross-lane s32 reduction.
    """
    d = pairwise_sqdist(x, y)
    dxy = jnp.min(d, axis=-1)
    ixy = _first_min_index(d, dxy, -1)
    dt = pairwise_sqdist(y, x)
    dyx = jnp.min(dt, axis=-1)
    iyx = _first_min_index(dt, dyx, -1)
    return dxy, ixy, dyx, iyx


# ---------------------------------------------------------------------------
# Pallas tiled nearest neighbor (both directions in one pass)
# ---------------------------------------------------------------------------

def _nn_kernel(x_ref, y_ref, minx_ref, argx_ref, miny_ref, argy_ref):
    """One (batch b, row-tile i) program.

    Blocks: x (TN, Dp) slice of this batch's points; y (M, Dp) full cloud.
    Row direction is complete per tile (written into its slice of the
    persistent (1, N) output row); column direction accumulates across the
    row-tile grid axis (sequential on TPU, same output block revisited).
    """
    i = pl.program_id(1)
    tn = x_ref.shape[1]

    x = x_ref[0]                         # (TN, Dp) f32
    y = y_ref[0]                         # (M, Dp) f32
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)            # (TN, 1)
    y_sq = jnp.sum(y * y, axis=1, keepdims=True)            # (M, 1)
    cross = jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                        # (TN, M)
    d = jnp.maximum(x_sq - 2.0 * cross + y_sq.T, 0.0)

    # Row direction: complete within this tile. First-index argmin via two
    # plain reduces (min + masked-iota min) — the VPU runs these far faster
    # than a variadic (value, index) reduction.
    m = d.shape[1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    row_min = jnp.min(d, axis=1)
    row_arg = jnp.min(
        jnp.where(d == row_min[:, None], col_iota, m), axis=1
    ).astype(jnp.int32)
    off = pl.multiple_of(i * tn, tn)
    minx_ref[0, 0, pl.ds(off, tn)] = row_min
    argx_ref[0, 0, pl.ds(off, tn)] = row_arg

    # Column direction: running min across row tiles.
    @pl.when(i == 0)
    def _init():
        miny_ref[0, 0, :] = jnp.full((d.shape[1],), _BIG, jnp.float32)
        argy_ref[0, 0, :] = jnp.zeros((d.shape[1],), jnp.int32)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    tile_min = jnp.min(d, axis=0)                            # (M,)
    tile_arg = jnp.min(
        jnp.where(d == tile_min[None, :], row_iota, tn), axis=0
    ).astype(jnp.int32) + i * tn
    cur_min = miny_ref[0, 0, :]
    better = tile_min < cur_min
    miny_ref[0, 0, :] = jnp.where(better, tile_min, cur_min)
    argy_ref[0, 0, :] = jnp.where(better, tile_arg, argy_ref[0, 0, :])


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _nn_pallas_both(
    x: jax.Array,
    y: jax.Array,
    *,
    tile_n: int = 256,
    interpret: Optional[bool] = None,
):
    """Nearest-neighbor dist+idx in both directions without HBM N^2.

    Returns (min_xy (B,N), arg_xy (B,N), min_yx (B,M), arg_yx (B,M)).
    """
    if interpret is None:
        interpret = interpret_default()
    b, n, _ = x.shape
    m = y.shape[1]
    tile_n = min(tile_n, n)
    while n % tile_n != 0:
        tile_n //= 2
    assert tile_n >= 1
    xp = pad_points(x.astype(jnp.float32))
    yp = pad_points(y.astype(jnp.float32))
    dp = xp.shape[-1]

    grid = (b, n // tile_n)
    out = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_n, dp), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, dp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # (B, 1, N) rows: full row resident in VMEM for all of batch b's
            # row tiles; satisfies TPU block-tiling (trailing dims == array).
            pl.BlockSpec((1, 1, n), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ],
        interpret=interpret,
    )(xp, yp)
    return tuple(o.reshape(o.shape[0], o.shape[2]) for o in out)


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------

def _nn_both(x, y, impl: str):
    if impl == "pallas":
        return _nn_pallas_both(x, y)
    return _nn_oracle_both(x, y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _chamfer(x, y, w1, w2, impl):
    dxy, _, dyx, _ = _nn_both(x, y, impl)
    return w1 * jnp.mean(dxy, axis=-1) + w2 * jnp.mean(dyx, axis=-1)


def _chamfer_fwd(x, y, w1, w2, impl):
    dxy, ixy, dyx, iyx = _nn_both(x, y, impl)
    loss = w1 * jnp.mean(dxy, axis=-1) + w2 * jnp.mean(dyx, axis=-1)
    return loss, (x, y, ixy, iyx)


def _chamfer_bwd(w1, w2, impl, res, g):
    """Index-routed backward: two XLA gathers + two Pallas mask-scatter
    kernels (ops/scatter.py). Fusing the gather INTO the scatter's mask
    kernel was measured and REJECTED both ways on the step trace (see
    ops/scatter.py note): the composition below is the fastest measured
    form (1.2 ms at B=32, N=M=2048)."""
    x, y, ixy, iyx = res
    n, m = x.shape[-2], y.shape[-2]
    gn = (g * (w1 * 2.0 / n))[..., None, None].astype(jnp.float32)
    gm = (g * (w2 * 2.0 / m))[..., None, None].astype(jnp.float32)

    # Direction x→y: d/dx_i = 2 (x_i - y_{j*}) / N
    diff_xy = x - jnp.take_along_axis(y, ixy[..., None], axis=-2)   # (B,N,D)
    gx_1 = gn * diff_xy
    # its pushforward onto y: scatter-add of -gx_1 at j*
    gy_1 = -_scatter_points(gx_1, ixy, m)

    # Direction y→x: d/dy_j = 2 (y_j - x_{i*}) / M
    diff_yx = y - jnp.take_along_axis(x, iyx[..., None], axis=-2)   # (B,M,D)
    gy_2 = gm * diff_yx
    gx_2 = -_scatter_points(gy_2, iyx, n)

    return (gx_1 + gx_2).astype(x.dtype), (gy_1 + gy_2).astype(y.dtype)


_chamfer.defvjp(_chamfer_fwd, _chamfer_bwd)


def _scatter_points(vals: jax.Array, idx: jax.Array, size: int) -> jax.Array:
    """Batched segment-sum: scatter (B,N,D) vals into (B,size,D) at idx.

    XLA's scatter-add runs serially (~1 GB/s measured on the train-step
    trace); the Pallas mask kernel (ops/scatter.py) does it as VMEM mask
    arithmetic when shapes tile."""
    from fpsg_tpu.ops.scatter import segment_sum_points

    return segment_sum_points(vals, idx, size)


def chamfer_distance(
    x: jax.Array,
    y: jax.Array,
    w1: float = 1.0,
    w2: float = 1.0,
    *,
    impl: str = "auto",
) -> jax.Array:
    """Kaolin-compatible squared Chamfer distance, per batch element ``(B,)``.

    Args:
      x: ``(B, N, D)`` predicted cloud (reference: synthesized 2048x3).
      y: ``(B, M, D)`` reference cloud.
      w1, w2: direction weights (Kaolin defaults 1.0/1.0).
      impl: 'pallas' (tiled kernel), 'oracle' (jnp), or 'auto'
            (pallas on TPU when N is tileable, else oracle).
    """
    if x.ndim == 2:
        x = x[None]
    if y.ndim == 2:
        y = y[None]
    n = x.shape[-2]
    m = y.shape[-2]
    if impl == "auto":
        # measured crossover (benchmarks/ops_bench.py, r2): with the
        # plain-reduce in-kernel argmin the VMEM kernel wins from ~1k
        # points up (B=33 N=2048 fwd+bwd: 5.4 ms vs 7.9 oracle); below
        # that XLA's fused oracle wins (and CPU tests stay off the
        # interpret-mode kernel)
        impl = (
            "pallas"
            if (n >= 1024 and n % 128 == 0 and m % 128 == 0)
            else "oracle"
        )
    return _chamfer(x, y, float(w1), float(w2), impl)


def nearest_neighbor(
    x: jax.Array, y: jax.Array, *, impl: str = "oracle"
) -> Tuple[jax.Array, jax.Array]:
    """Per-point nearest squared distance and index of ``x`` into ``y``."""
    if impl == "pallas":
        dxy, ixy, _, _ = _nn_pallas_both(x, y)
        return dxy, ixy
    return _nn_oracle(x, y)


def masked_chamfer_distance(
    x: jax.Array,
    y: jax.Array,
    mask_x: Optional[jax.Array] = None,
    mask_y: Optional[jax.Array] = None,
    w1: float = 1.0,
    w2: float = 1.0,
) -> jax.Array:
    """Chamfer over ragged (padded) clouds: invalid points are excluded from
    both the means and the nearest-neighbor candidates.

    Args:
      x: ``(B, N, D)``; mask_x: ``(B, N)`` bool (True = valid), or None.
      y: ``(B, M, D)``; mask_y: ``(B, M)`` bool, or None.

    The reference never needs this (clouds are padded to exactly 2048 by
    resampling real points), but ragged per-class corpora do (SURVEY.md §7
    hard part 5). Differentiable (pure jnp; masked min via +inf costs).
    """
    if x.ndim == 2:
        x, y = x[None], y[None]
    n, m = x.shape[-2], y.shape[-2]
    ones = lambda a, k: jnp.ones(a.shape[:-1], bool) if k is None else k
    mask_x = ones(x, mask_x)
    mask_y = ones(y, mask_y)

    d = pairwise_sqdist(x, y)
    big = jnp.float32(1e30)
    d_xy = jnp.where(mask_y[:, None, :], d, big)       # invalid y excluded
    d_yx = jnp.where(mask_x[:, :, None], d, big)       # invalid x excluded

    min_xy = jnp.min(d_xy, axis=-1)                    # (B, N)
    min_yx = jnp.min(d_yx, axis=-2)                    # (B, M)

    nx = jnp.maximum(jnp.sum(mask_x, axis=-1), 1)
    ny = jnp.maximum(jnp.sum(mask_y, axis=-1), 1)
    term1 = jnp.sum(jnp.where(mask_x, min_xy, 0.0), axis=-1) / nx
    term2 = jnp.sum(jnp.where(mask_y, min_yx, 0.0), axis=-1) / ny
    return w1 * term1 + w2 * term2
