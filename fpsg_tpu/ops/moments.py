"""One-pass moments + per-batch max/min reduce for BN→global-maxpool.

The PointNet ``conv3 → BatchNorm(+relu) → max over points`` sites need
four reductions of the same (B, N, F) conv output: the BN batch
statistics (sum and squared-sum over (B, N), in the single-read shifted
form) and the per-batch max/min over N (min because a negative BN scale
turns the commuted max into a min — see ``nn/pointnet.py:_bn_maxpool``).
XLA emits each as its own ~660 GB/s pass over the tensor (measured:
the jnp max + min alone cost 2.0 ms/step at (65, 2048, 1024)); this
kernel computes all four in ONE read, and its custom VJP routes the
max/min cotangents by the saved argmax/argmin indices (first-index,
torch tie semantics) fused with the statistics terms in one output
pass — no equality-scan re-read of the input.

Reference behavior covered: ``torch.max(x, 2)`` over
``bn3(conv3(x))`` — pointnet/model.py:28-33, :63-70, :225-232.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops._pallas_utils import interpret_default

_INF = float("inf")  # python float: jnp module constants become captured
                     # tracers. ±inf (not a big-finite sentinel) so values
                     # beyond any threshold still compare correctly and the
                     # all-(-inf) channel matches jnp.max's -inf/argmax-0.


def _fwd_kernel_factory(tile_n: int, f: int):
    def kernel(y_ref, s_ref, zs_ref, zq_ref,
               ymax_ref, imax_ref, ymin_ref, imin_ref):
        # per-batch outputs are (B, 1, F) with (1, 1, F) blocks — the
        # singleton middle axis satisfies Mosaic's block constraint
        # (last two block dims divisible by (8, 128) OR equal to the
        # array dims; a bare (1, F) block over (B, F) is rejected)
        bi = pl.program_id(0)
        t = pl.program_id(1)
        y = y_ref[0].astype(jnp.float32)               # (TN, F)

        @pl.when(jnp.logical_and(bi == 0, t == 0))
        def _():
            zs_ref[0] = jnp.zeros((f,), jnp.float32)
            zq_ref[0] = jnp.zeros((f,), jnp.float32)

        @pl.when(t == 0)
        def _():
            ymax_ref[0, 0] = jnp.full((f,), -_INF, jnp.float32)
            imax_ref[0, 0] = jnp.zeros((f,), jnp.int32)
            ymin_ref[0, 0] = jnp.full((f,), _INF, jnp.float32)
            imin_ref[0, 0] = jnp.zeros((f,), jnp.int32)

        z = y - s_ref[0][None, :]
        zs_ref[0] += jnp.sum(z, axis=0)
        zq_ref[0] += jnp.sum(z * z, axis=0)

        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, f), 0)
        tmax = jnp.max(y, axis=0)                      # (F,)
        targ = jnp.min(
            jnp.where(y == tmax[None, :], rows, tile_n), axis=0
        ) + t * tile_n                                 # first index in tile
        # strict > keeps the EARLIER tile's value on cross-tile ties
        # (first-index, torch semantics)
        better = tmax > ymax_ref[0, 0]
        imax_ref[0, 0] = jnp.where(better, targ, imax_ref[0, 0])
        ymax_ref[0, 0] = jnp.where(better, tmax, ymax_ref[0, 0])

        tmin = jnp.min(y, axis=0)
        targ_n = jnp.min(
            jnp.where(y == tmin[None, :], rows, tile_n), axis=0
        ) + t * tile_n
        better_n = tmin < ymin_ref[0, 0]
        imin_ref[0, 0] = jnp.where(better_n, targ_n, imin_ref[0, 0])
        ymin_ref[0, 0] = jnp.where(better_n, tmin, ymin_ref[0, 0])

    return kernel


def _bwd_kernel_factory(tile_n: int, f: int, out_dtype):
    def kernel(y_ref, a_ref, b_ref, gmax_ref, imax_ref,
               gmin_ref, imin_ref, gy_ref):
        t = pl.program_id(1)
        # stat cotangent in hoisted form: gzs + 2*(y-s)*gzq == A + y*B
        # with A = gzs - 2*s*gzq, B = 2*gzq precomputed per channel
        y = y_ref[0].astype(jnp.float32)               # (TN, F)
        gy = a_ref[0][None, :] + y * b_ref[0][None, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tile_n, f), 0) \
            + t * tile_n
        gy += jnp.where(rows == imax_ref[0, 0][None, :],
                        gmax_ref[0, 0][None, :], 0.0)
        gy += jnp.where(rows == imin_ref[0, 0][None, :],
                        gmin_ref[0, 0][None, :], 0.0)
        gy_ref[0] = gy.astype(out_dtype)

    return kernel


def _pick_tile(n: int, cap: int = 512) -> int:
    tn = min(cap, n)
    while n % tn != 0:
        tn //= 2
    return tn


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moments_fwd_pallas(y, s, interpret):
    b, n, f = y.shape
    tn = _pick_tile(n)
    chan = pl.BlockSpec((1, f), lambda bi, t: (0, 0),
                        memory_space=pltpu.VMEM)
    per_b = pl.BlockSpec((1, 1, f), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    zs, zq, ymax, imax, ymin, imin = pl.pallas_call(
        _fwd_kernel_factory(tn, f),
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, f), lambda bi, t: (bi, t, 0),
                         memory_space=pltpu.VMEM),
            chan,
        ],
        out_specs=[chan, chan, per_b, per_b, per_b, per_b],
        out_shape=[
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, f), jnp.int32),
        ],
        interpret=interpret,
    )(y, s.reshape(1, f).astype(jnp.float32))
    return zs[0], zq[0], ymax[:, 0], imax[:, 0], ymin[:, 0], imin[:, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _moments_bwd_pallas(y, s, gzs, gzq, gmax, imax, gmin, imin, interpret):
    b, n, f = y.shape
    tn = _pick_tile(n)
    chan = pl.BlockSpec((1, f), lambda bi, t: (0, 0),
                        memory_space=pltpu.VMEM)
    per_b = pl.BlockSpec((1, 1, f), lambda bi, t: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    bvec = 2.0 * gzq.astype(jnp.float32)
    avec = gzs.astype(jnp.float32) - s.astype(jnp.float32) * bvec
    gy = pl.pallas_call(
        _bwd_kernel_factory(tn, f, y.dtype),
        grid=(b, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, f), lambda bi, t: (bi, t, 0),
                         memory_space=pltpu.VMEM),
            chan, chan, per_b, per_b, per_b, per_b,
        ],
        out_specs=pl.BlockSpec((1, tn, f), lambda bi, t: (bi, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, f), y.dtype),
        interpret=interpret,
    )(y, avec.reshape(1, f), bvec.reshape(1, f),
      gmax[:, None].astype(jnp.float32), imax[:, None],
      gmin[:, None].astype(jnp.float32), imin[:, None])
    return gy


@jax.custom_vjp
def moments_minmax(y: jax.Array, s: jax.Array):
    """One-read reduce of ``y (B, N, F)``: returns
    ``(zsum (F,), zsq (F,), ymax (B, F), ymin (B, F))`` where
    ``z = y - s`` (``s (F,)`` is the stop-gradient stat shift — the BN
    single-read shifted form) and max/min reduce over N.

    Gradients: d zsum/dy = 1, d zsq/dy = 2z, and the max/min cotangents
    route to the FIRST attaining index (torch tie semantics — jnp.max's
    VJP splits ties instead). ``s`` receives zero cotangent (it is
    stop-gradient at every call site).
    """
    zs, zq, ymax, _, ymin, _ = _moments_fwd_pallas(
        y, s, interpret_default())
    return zs, zq, ymax, ymin


def _moments_fwd(y, s):
    zs, zq, ymax, imax, ymin, imin = _moments_fwd_pallas(
        y, s, interpret_default())
    return (zs, zq, ymax, ymin), (y, s, imax, imin)


def _moments_bwd(res, cots):
    y, s, imax, imin = res
    gzs, gzq, gmax, gmin = cots
    gy = _moments_bwd_pallas(y, s, gzs, gzq, gmax, imax, gmin, imin,
                             interpret_default())
    return gy, jnp.zeros_like(s)


moments_minmax.defvjp(_moments_fwd, _moments_bwd)


def moments_minmax_oracle(y: jax.Array, s: jax.Array):
    """jnp reference implementation (same values; jnp tie semantics in
    the max/min gradients)."""
    z = y.astype(jnp.float32) - s[None, None, :]
    zs = jnp.sum(z, axis=(0, 1))
    zq = jnp.sum(z * z, axis=(0, 1))
    yf = y.astype(jnp.float32)
    return zs, zq, jnp.max(yf, axis=1), jnp.min(yf, axis=1)


def supports_kernel(y: jax.Array) -> bool:
    """Shape gate for the Pallas path (lane-sized F, tileable N —
    ``_pick_tile`` always returns a divisor, so only its size gates)."""
    n, f = y.shape[1], y.shape[2]
    return (not interpret_default()) and f % 128 == 0 \
        and _pick_tile(n) >= 8
