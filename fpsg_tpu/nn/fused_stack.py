"""Fused Pallas kernels for the stacked primitive-node MLP chain.

Re-design of the decoder hot path (reference ``src/models/point_cloud_net.py:
66-110``: 16 Python-loop PrimitiveNode chains of Conv1d→BN→ReLU). Round 2
ran this as stacked XLA einsums with BN between them — already at the
measured XLA matmul ceiling (81 TF/s) for the matmuls, but every layer
paid matmul→stats-read→affine-read/write round trips over the (B,C,Nn,P,d)
activations (~the r2 trace's decoder non-matmul 9.5 ms). Here each layer is
ONE kernel:

  - the previous layer's BN affine (+ReLU) is applied in the matmul
    PROLOGUE (in-register, as the tile is loaded),
  - the matmul runs on the MXU,
  - batch statistics of the OUTPUT are accumulated in the EPILOGUE
    (before writeback), in the single-read shifted form,

so each activation tensor is written once and read once per layer instead
of written once and read 2-3x (stats pass + affine pass + next matmul).
The backward is two kernels per layer with the same fusion structure
(cotangent adjustment + mask + per-channel reduces folded into the dgrad
and wgrad matmuls).

Layout: activations live in group-major ``(C, Nn, R, D)`` with
``R = B * P`` rows (B clouds x P points per node) — the matmul's natural
layout for per-(cluster, node) weights, chosen so no transpose of the big
tensors ever happens (the small deformer/conditioning/output tensors are
transposed instead).

Mosaic constraint note: the last two dims of every block must be
(divisible by 8, divisible by 128) or equal to the array dims — so the
small per-(c, n) channel vectors (k, b, s, stat accumulators) are blocked
as the FULL (1, Nn, D) plane indexed by ``pl.program_id(1)`` in-kernel,
and per-cloud vectors (y_cond, sc, their grads) as the full (1, 1, B, D)
plane indexed dynamically by row.

Statistics: BN needs mean/var of the raw layer output y over R rows per
(c, n, channel). The kernels accumulate, per (c, n, channel):

    zsum = sum_r z,  zsq = sum_r z^2,  [zcov = sum_r z * sc]

with ``z = y - s`` for a shift ``s``:
  - mid layers: ``s = running_mean - folded_bias`` (constant per channel)
    → var = zsq/R - (zsum/R)^2, the same single-read shifted form as
    :class:`fpsg_tpu.nn.normalization.BatchNorm` ``two_pass=False``;
  - layer 1: ``s = y_cond`` (the hoisted conditioning matmul output, which
    varies per cloud and IS the problematic mean offset at B=1 —
    DESIGN.md §8) → with ``sc = y_cond - mean_b(y_cond)``:

        var(y) = var(z) + 2*cov(z, sc) + var(y_cond)

    where var(z) and cov come from the accumulators and var(y_cond) is
    exact two-pass math on the small conditioning tensor. This equals the
    TWO-pass variance exactly (no catastrophic cancellation: z = the
    small point-dependent part), in one read — layer 1 keeps its
    ``two_pass=True`` robustness for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops._pallas_utils import interpret_default


def _row_tile(rows: int, p: int, cap: int = 512) -> int:
    """Largest multiple of P dividing R, capped (MXU-friendly M). Backward
    kernels use cap=256: their per-tile f32 intermediates (adjusted
    cotangent, dgrad, mask) put a 512-row tile of the 1539-wide layer
    over the 16 MB VMEM scope (measured OOM at 21.6M)."""
    t = p
    while t * 2 <= cap and rows % (t * 2) == 0:
        t *= 2
    # prefer 3*P (=384 for P=128) when it divides (B multiple of 3, e.g. 33)
    if rows % (3 * p) == 0 and cap >= 3 * p > t:
        t = 3 * p
    return t


def _specs(c, nn_, tr, shapes):
    """BlockSpecs for the fused kernels; kinds (Mosaic note above):
      rows   (C, Nn, R, D)  -> (1, 1, tr, D)  at (ci, ni, ti)
      chan   (C, Nn, D)     -> (1, Nn, D)     at (ci, 0, 0); row = ni
      cloud  (C, Nn, B, D)  -> (1, 1, B, D)   at (ci, ni, 0); row dynamic
      weight (C, Nn, Di, Do)-> (1, 1, Di, Do) at (ci, ni)
    """
    specs = []
    for kind, dims in shapes:
        if kind == "rows":
            specs.append(pl.BlockSpec(
                (1, 1, tr, dims), lambda ci, ni, ti: (ci, ni, ti, 0),
                memory_space=pltpu.VMEM))
        elif kind == "chan":
            specs.append(pl.BlockSpec(
                (1, nn_, dims), lambda ci, ni, ti: (ci, 0, 0),
                memory_space=pltpu.VMEM))
        elif kind == "cloud":
            specs.append(pl.BlockSpec(
                (1, 1) + dims, lambda ci, ni, ti: (ci, ni, 0, 0),
                memory_space=pltpu.VMEM))
        elif kind == "weight":
            specs.append(pl.BlockSpec(
                (1, 1) + dims, lambda ci, ni, ti: (ci, ni, 0, 0),
                memory_space=pltpu.VMEM))
        else:
            raise ValueError(kind)
    return specs


# ---------------------------------------------------------------------------
# Mid layer: y = relu(k * yp + b) @ W  (+ stats of y)
# ---------------------------------------------------------------------------


def _mid_fwd_kernel_factory(with_stats: bool):
    def kernel(yp_ref, k_ref, b_ref, w_ref, s_ref, y_ref, zs_ref, zq_ref):
        ni = pl.program_id(1)
        t = pl.program_id(2)
        dt = yp_ref.dtype
        a = jnp.maximum(
            yp_ref[0, 0] * k_ref[0, ni][None, :].astype(dt)
            + b_ref[0, ni][None, :].astype(dt),
            0,
        )
        y = jax.lax.dot_general(
            a, w_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        yc = y.astype(dt)
        y_ref[0, 0] = yc
        if with_stats:
            z = yc.astype(jnp.float32) - s_ref[0, ni][None, :]

            @pl.when(t == 0)
            def _():
                zs_ref[0, ni] = jnp.zeros_like(zs_ref[0, ni])
                zq_ref[0, ni] = jnp.zeros_like(zq_ref[0, ni])

            zs_ref[0, ni] += jnp.sum(z, axis=0)
            zq_ref[0, ni] += jnp.sum(z * z, axis=0)

    return kernel


def _mid_bwd_dx_kernel_factory(with_stats: bool):
    """dyp = k * relu'(a) * (gY_adj @ W^T); dk/db per-channel reduces.

    gY_adj = gY + gzs + 2*(y - s)*gzq (the stat cotangent terms).
    """

    def kernel(yp_ref, k_ref, b_ref, w_ref, s_ref, y_ref, gy_ref,
               gzs_ref, gzq_ref, dyp_ref, dk_ref, db_ref):
        ni = pl.program_id(1)
        t = pl.program_id(2)
        dt = yp_ref.dtype
        gy = gy_ref[0, 0].astype(jnp.float32)
        if with_stats:
            z = y_ref[0, 0].astype(jnp.float32) - s_ref[0, ni][None, :]
            gy = gy + gzs_ref[0, ni][None, :] \
                + 2.0 * z * gzq_ref[0, ni][None, :]
        da = jax.lax.dot_general(
            gy.astype(dt), w_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        yp = yp_ref[0, 0]
        pre = yp * k_ref[0, ni][None, :].astype(dt) \
            + b_ref[0, ni][None, :].astype(dt)
        # compare in f32: v5e Mosaic has no native bf16 comparison
        dm = jnp.where(pre.astype(jnp.float32) > 0, da, 0.0)
        dyp_ref[0, 0] = (dm * k_ref[0, ni][None, :]).astype(dt)

        @pl.when(t == 0)
        def _():
            dk_ref[0, ni] = jnp.zeros_like(dk_ref[0, ni])
            db_ref[0, ni] = jnp.zeros_like(db_ref[0, ni])

        dk_ref[0, ni] += jnp.sum(dm * yp.astype(jnp.float32), axis=0)
        db_ref[0, ni] += jnp.sum(dm, axis=0)

    return kernel


def _mid_bwd_dw_kernel_factory(with_stats: bool):
    """dW = A^T @ gY_adj, accumulated over row tiles (A recomputed).

    The Dout axis is tiled by the grid's 3rd dim (TD columns at a time):
    a full (Din, Dout) f32 accumulator block for the 1539x769 layer
    exceeds the 16 MB VMEM scope; per-Dout-tile blocks fit (grid =
    (C, Nn, nDo, nT), rows innermost so each dW tile accumulates in
    VMEM across its row sweep). A is recomputed per Dout tile — the
    prologue is cheap next to the wgrad matmul.
    """

    def kernel(yp_ref, k_ref, b_ref, s_ref, y_ref, gy_ref,
               gzs_ref, gzq_ref, dw_ref):
        ni = pl.program_id(1)
        t = pl.program_id(3)
        dt = yp_ref.dtype
        gy = gy_ref[0, 0].astype(jnp.float32)
        if with_stats:
            z = y_ref[0, 0].astype(jnp.float32) - s_ref[0, ni][None, :]
            gy = gy + gzs_ref[0, ni][None, :] \
                + 2.0 * z * gzq_ref[0, ni][None, :]
        a = jnp.maximum(
            yp_ref[0, 0] * k_ref[0, ni][None, :].astype(dt)
            + b_ref[0, ni][None, :].astype(dt),
            0,
        )
        dw = jax.lax.dot_general(
            a, gy.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(t == 0)
        def _():
            dw_ref[0, 0] = jnp.zeros_like(dw_ref[0, 0])

        dw_ref[0, 0] += dw

    return kernel


_DW_COL_TILE = 256
_DW_OVERRIDE = None   # probe hook: (td, tr_dw) for the split dW kernel


def _dw_bytes(tr: int, din: int, td: int, isz: int) -> int:
    """VMEM estimate for the split dW kernel: dW block + the pre-`+=`
    dot result, the double-buffered swept inputs, and the f32
    intermediates (adjusted gy, z)."""
    return (2 * din * td * 4 + 2 * tr * (din + 2 * td) * isz
            + 4 * tr * (din + 3 * td) + tr * din * isz)


# Measured on v5e (benchmarks/fused_stack_probe.py, production decoder
# shapes C=Nn=4, R=1536, bf16): the (769->384) layer at full-width dW
# runs 0.36 ms vs 0.40 at the 256-column tiling; the (1539->769) layer
# REFUSES full width (compile failure at tr<=128; td=512 measured
# SLOWER, 1.46 vs 1.38 — the halved-K wgrad loses more than the saved
# re-reads) and keeps the historical tiling. A fully-combined
# dgrad+wgrad one-kernel backward was also measured and REJECTED:
# 0.49 vs 0.36 ms on the layer where it fit, and >16 MB scoped VMEM
# (dW block + its pre-accumulate dot result + double-buffered w) on
# the wider one.
_DW_FULL_BUDGET = 8 * 2**20


def _dw_tiles(r: int, p: int, din: int, dout: int, isz: int):
    """(Dout tile, row tile) for the split dW kernel. Prefer the FULL
    Dout width (nDo=1: one sweep of yp/y/gy instead of one per Dout
    tile) at the largest row tile fitting the measured VMEM budget;
    fall back to the historical (256-column, 256-row) tiling."""
    if _DW_OVERRIDE is not None:
        return _DW_OVERRIDE
    tr = _row_tile(r, p, cap=256)
    while tr >= 128:
        if r % tr == 0 and _dw_bytes(tr, din, dout, isz) \
                <= _DW_FULL_BUDGET:
            return dout, tr
        tr //= 2
    return min(_DW_COL_TILE, dout), _row_tile(r, p, cap=256)


def _dw_specs(c, nn_, tr, din, dout, td):
    """Specs for the Dout-tiled dW kernel (grid (C, Nn, nDo, nT))."""
    return [
        pl.BlockSpec((1, 1, tr, din), lambda ci, ni, di, ti: (ci, ni, ti, 0),
                     memory_space=pltpu.VMEM),                       # yp
        pl.BlockSpec((1, nn_, din), lambda ci, ni, di, ti: (ci, 0, 0),
                     memory_space=pltpu.VMEM),                       # k
        pl.BlockSpec((1, nn_, din), lambda ci, ni, di, ti: (ci, 0, 0),
                     memory_space=pltpu.VMEM),                       # b
        pl.BlockSpec((1, nn_, td), lambda ci, ni, di, ti: (ci, 0, di),
                     memory_space=pltpu.VMEM),                       # s
        pl.BlockSpec((1, 1, tr, td), lambda ci, ni, di, ti: (ci, ni, ti, di),
                     memory_space=pltpu.VMEM),                       # y
        pl.BlockSpec((1, 1, tr, td), lambda ci, ni, di, ti: (ci, ni, ti, di),
                     memory_space=pltpu.VMEM),                       # gy
        pl.BlockSpec((1, nn_, td), lambda ci, ni, di, ti: (ci, 0, di),
                     memory_space=pltpu.VMEM),                       # gzs
        pl.BlockSpec((1, nn_, td), lambda ci, ni, di, ti: (ci, 0, di),
                     memory_space=pltpu.VMEM),                       # gzq
    ], pl.BlockSpec((1, 1, din, td), lambda ci, ni, di, ti: (ci, ni, 0, di),
                    memory_space=pltpu.VMEM)                         # dW


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_mid_layer(yp, k, b, w, s, with_stats: bool, p: int):
    """relu(k*yp + b) @ w with fused output statistics.

    Args:
      yp: (C, Nn, R, Din) previous layer's raw output.
      k, b: (C, Nn, Din) f32 — the previous BN's collapsed affine.
      w: (C, Nn, Din, Dout) stacked weights.
      s: (C, Nn, Dout) f32 stat shift (ignored if not with_stats).
      with_stats: accumulate (zsum, zsq) of z = y - s over rows.
      p: points per cloud (row-tile granularity).

    Returns: (y, zsum, zsq); zsum/zsq are zeros when with_stats=False.
    """
    return _fused_mid_fwd(yp, k, b, w, s, with_stats, p)


@functools.partial(jax.jit, static_argnames=("with_stats", "p"))
def _fused_mid_fwd(yp, k, b, w, s, with_stats, p):
    c, nn_, r, din = yp.shape
    dout = w.shape[-1]
    tr = _row_tile(r, p)
    grid = (c, nn_, r // tr)
    y, zs, zq = pl.pallas_call(
        _mid_fwd_kernel_factory(with_stats),
        grid=grid,
        in_specs=_specs(c, nn_, tr, [
            ("rows", din), ("chan", din), ("chan", din),
            ("weight", (din, dout)), ("chan", dout),
        ]),
        out_specs=_specs(c, nn_, tr, [
            ("rows", dout), ("chan", dout), ("chan", dout),
        ]),
        out_shape=[
            jax.ShapeDtypeStruct((c, nn_, r, dout), yp.dtype),
            jax.ShapeDtypeStruct((c, nn_, dout), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, dout), jnp.float32),
        ],
        interpret=interpret_default(),
    )(yp, k.astype(jnp.float32), b.astype(jnp.float32), w,
      s.astype(jnp.float32))
    return y, zs, zq


def _fused_mid_fwd_vjp(yp, k, b, w, s, with_stats, p):
    y, zs, zq = _fused_mid_fwd(yp, k, b, w, s, with_stats, p)
    return (y, zs, zq), (yp, k, b, w, s, y)


@functools.partial(jax.jit, static_argnames=("with_stats", "p"))
def _fused_mid_bwd_impl(yp, k, b, w, s, y, gy, gzs, gzq, with_stats, p):
    c, nn_, r, din = yp.shape
    dout = w.shape[-1]
    kf = k.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    gzs = gzs.astype(jnp.float32)
    gzq = gzq.astype(jnp.float32)
    tr = _row_tile(r, p, cap=256)
    grid = (c, nn_, r // tr)
    dyp, dk, db = pl.pallas_call(
        _mid_bwd_dx_kernel_factory(with_stats),
        grid=grid,
        in_specs=_specs(c, nn_, tr, [
            ("rows", din), ("chan", din), ("chan", din),
            ("weight", (din, dout)), ("chan", dout), ("rows", dout),
            ("rows", dout), ("chan", dout), ("chan", dout),
        ]),
        out_specs=_specs(c, nn_, tr, [
            ("rows", din), ("chan", din), ("chan", din),
        ]),
        out_shape=[
            jax.ShapeDtypeStruct((c, nn_, r, din), yp.dtype),
            jax.ShapeDtypeStruct((c, nn_, din), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, din), jnp.float32),
        ],
        interpret=interpret_default(),
    )(yp, kf, bf, w, sf, y, gy, gzs, gzq)
    td, tr_dw = _dw_tiles(r, p, din, dout, yp.dtype.itemsize)
    in_specs, out_spec = _dw_specs(c, nn_, tr_dw, din, dout, td)
    dw = pl.pallas_call(
        _mid_bwd_dw_kernel_factory(with_stats),
        grid=(c, nn_, pl.cdiv(dout, td), r // tr_dw),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((c, nn_, din, dout), jnp.float32),
        interpret=interpret_default(),
    )(yp, kf, bf, sf, y, gy, gzs, gzq)
    return dyp, dk.astype(k.dtype), db.astype(b.dtype), dw.astype(w.dtype)


def _fused_mid_bwd(with_stats, p, res, cots):
    yp, k, b, w, s, y = res
    gy, gzs, gzq = cots
    dyp, dk, db, dw = _fused_mid_bwd_impl(
        yp, k, b, w, s, y, gy, gzs, gzq, with_stats, p
    )
    return dyp, dk, db, dw, jnp.zeros_like(s)


fused_mid_layer.defvjp(_fused_mid_fwd_vjp, _fused_mid_bwd)


# ---------------------------------------------------------------------------
# Layer 1: y = d @ Wd + y_cond  (+ robust two-pass-equivalent stats)
# ---------------------------------------------------------------------------
#
# d: the deformed template points (Din = raw_dim padded to 8, tiny K);
# y_cond: the hoisted conditioning matmul output, constant over the P
# points of a cloud. The stats are of z = d @ Wd (the small point part),
# plus the covariance accumulator against centered y_cond.


def _l1_fwd_kernel_factory(with_stats: bool, p: int, bpt: int):
    def kernel(d_ref, wd_ref, yc_ref, sc_ref, y_ref, zs_ref, zq_ref, zc_ref):
        ni = pl.program_id(1)
        t = pl.program_id(2)
        dt = d_ref.dtype
        z = jax.lax.dot_general(
            d_ref[0, 0], wd_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # add per-cloud conditioning: rows [j*P, (j+1)*P) share cloud
        # t*bpt + j of the (full-B) yc block
        parts = []
        for j in range(bpt):
            yc = yc_ref[0, 0, t * bpt + j][None, :].astype(jnp.float32)
            parts.append(z[j * p:(j + 1) * p] + yc)
        y = jnp.concatenate(parts, axis=0) if bpt > 1 else parts[0]
        yc_out = y.astype(dt)
        y_ref[0, 0] = yc_out
        if with_stats:
            @pl.when(t == 0)
            def _():
                zs_ref[0, ni] = jnp.zeros_like(zs_ref[0, ni])
                zq_ref[0, ni] = jnp.zeros_like(zq_ref[0, ni])
                zc_ref[0, ni] = jnp.zeros_like(zc_ref[0, ni])

            # z re-derived from the ROUNDED y so stats match what a
            # reader of the written tensor would compute
            zsum = jnp.zeros_like(zs_ref[0, ni])
            zsq = jnp.zeros_like(zs_ref[0, ni])
            cov = jnp.zeros_like(zs_ref[0, ni])
            for j in range(bpt):
                yc = yc_ref[0, 0, t * bpt + j][None, :].astype(jnp.float32)
                zr = yc_out[j * p:(j + 1) * p].astype(jnp.float32) - yc
                sc = sc_ref[0, 0, t * bpt + j][None, :]
                zsum += jnp.sum(zr, axis=0)
                zsq += jnp.sum(zr * zr, axis=0)
                cov += jnp.sum(zr * sc, axis=0)
            zs_ref[0, ni] += zsum
            zq_ref[0, ni] += zsq
            zc_ref[0, ni] += cov

    return kernel


def _l1_bwd_kernel_factory(with_stats: bool, p: int, bpt: int):
    """dd = gY_adj @ Wd^T; dWd accumulate; dyc = per-cloud row sums.

    gY_adj = gY + [gzs + 2*z*gzq + sc*gzc applied to the z part]; the z
    part's cotangent flows into d (via Wd) but NOT into y_cond; the plain
    gY flows into both.
    """

    def kernel(d_ref, wd_ref, yc_ref, sc_ref, y_ref, gy_ref,
               gzs_ref, gzq_ref, gzc_ref,
               dd_ref, dwd_ref, dyc_ref, dsc_ref):
        ni = pl.program_id(1)
        t = pl.program_id(2)
        dt = d_ref.dtype
        gy = gy_ref[0, 0].astype(jnp.float32)
        gt = gy
        if with_stats:
            gz_parts = []
            for j in range(bpt):
                yc = yc_ref[0, 0, t * bpt + j][None, :].astype(jnp.float32)
                sc = sc_ref[0, 0, t * bpt + j][None, :]
                zj = y_ref[0, 0][j * p:(j + 1) * p].astype(jnp.float32) - yc
                gz_parts.append(
                    gzs_ref[0, ni][None, :]
                    + 2.0 * zj * gzq_ref[0, ni][None, :]
                    + sc * gzc_ref[0, ni][None, :]
                )
            gz = jnp.concatenate(gz_parts, axis=0) if bpt > 1 else gz_parts[0]
            gt = gy + gz                                # d(z=d@Wd) path
        dd_ref[0, 0] = jax.lax.dot_general(
            gt.astype(dt), wd_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        dwd = jax.lax.dot_general(
            d_ref[0, 0], gt.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(t == 0)
        def _():
            dwd_ref[0, 0] = jnp.zeros_like(dwd_ref[0, 0])

        dwd_ref[0, 0] += dwd
        for j in range(bpt):
            # y_cond add path: only the plain gY (z excludes y_cond)
            dyc_ref[0, 0, t * bpt + j] = jnp.sum(
                gy[j * p:(j + 1) * p], axis=0)
            if with_stats:
                yc = yc_ref[0, 0, t * bpt + j][None, :].astype(jnp.float32)
                zj = y_ref[0, 0][j * p:(j + 1) * p].astype(jnp.float32) - yc
                dsc_ref[0, 0, t * bpt + j] = (
                    jnp.sum(zj, axis=0) * gzc_ref[0, ni]
                )
            else:
                dsc_ref[0, 0, t * bpt + j] = jnp.zeros_like(
                    dsc_ref[0, 0, t * bpt + j])

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_l1_layer(d, wd, y_cond, sc, with_stats: bool, p: int):
    """d @ wd + y_cond with fused robust statistics.

    Args:
      d: (C, Nn, R, Din) deformed template points (Din = raw_dim, padded).
      wd: (C, Nn, Din, Dout).
      y_cond: (C, Nn, B, Dout) f32 per-cloud conditioning (R = B*p rows).
        f32 required: the kernel indexes cloud rows dynamically, and
        Mosaic only proves sublane alignment at f32 granularity (bf16
        packs 2 sublanes per tile row).
      sc: (C, Nn, B, Dout) f32 — y_cond centered by its global row-mean.
    Returns: (y, zsum, zsq, zcov) with z = y - y_cond per row.
    """
    return _fused_l1_fwd(d, wd, y_cond, sc, with_stats, p)


@functools.partial(jax.jit, static_argnames=("with_stats", "p"))
def _fused_l1_fwd(d, wd, y_cond, sc, with_stats, p):
    c, nn_, r, din = d.shape
    dout = wd.shape[-1]
    b = r // p
    tr = _row_tile(r, p)
    bpt = tr // p                                   # clouds per row tile
    grid = (c, nn_, r // tr)
    y, zs, zq, zc = pl.pallas_call(
        _l1_fwd_kernel_factory(with_stats, p, bpt),
        grid=grid,
        in_specs=_specs(c, nn_, tr, [
            ("rows", din), ("weight", (din, dout)),
            ("cloud", (b, dout)), ("cloud", (b, dout)),
        ]),
        out_specs=_specs(c, nn_, tr, [
            ("rows", dout), ("chan", dout), ("chan", dout), ("chan", dout),
        ]),
        out_shape=[
            jax.ShapeDtypeStruct((c, nn_, r, dout), d.dtype),
            jax.ShapeDtypeStruct((c, nn_, dout), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, dout), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, dout), jnp.float32),
        ],
        interpret=interpret_default(),
    )(d, wd, y_cond.astype(jnp.float32), sc.astype(jnp.float32))
    return y, zs, zq, zc


def _fused_l1_fwd_vjp(d, wd, y_cond, sc, with_stats, p):
    y, zs, zq, zc = _fused_l1_fwd(d, wd, y_cond, sc, with_stats, p)
    return (y, zs, zq, zc), (d, wd, y_cond, sc, y)


@functools.partial(jax.jit, static_argnames=("with_stats", "p"))
def _fused_l1_bwd_impl(d, wd, y_cond, sc, y, gy, gzs, gzq, gzc,
                       with_stats, p):
    c, nn_, r, din = d.shape
    dout = wd.shape[-1]
    b = r // p
    tr = _row_tile(r, p)
    bpt = tr // p
    grid = (c, nn_, r // tr)
    dd, dwd, dyc, dsc = pl.pallas_call(
        _l1_bwd_kernel_factory(with_stats, p, bpt),
        grid=grid,
        in_specs=_specs(c, nn_, tr, [
            ("rows", din), ("weight", (din, dout)),
            ("cloud", (b, dout)), ("cloud", (b, dout)),
            ("rows", dout), ("rows", dout),
            ("chan", dout), ("chan", dout), ("chan", dout),
        ]),
        out_specs=_specs(c, nn_, tr, [
            ("rows", din), ("weight", (din, dout)),
            ("cloud", (b, dout)), ("cloud", (b, dout)),
        ]),
        out_shape=[
            jax.ShapeDtypeStruct((c, nn_, r, din), d.dtype),
            jax.ShapeDtypeStruct((c, nn_, din, dout), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, b, dout), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, b, dout), jnp.float32),
        ],
        interpret=interpret_default(),
    )(d, wd, y_cond.astype(jnp.float32), sc.astype(jnp.float32), y, gy,
      gzs.astype(jnp.float32), gzq.astype(jnp.float32),
      gzc.astype(jnp.float32))
    return dd, dwd.astype(wd.dtype), dyc.astype(y_cond.dtype), \
        dsc.astype(sc.dtype)


def _fused_l1_bwd(with_stats, p, res, cots):
    d, wd, y_cond, sc, y = res
    gy, gzs, gzq, gzc = cots
    return _fused_l1_bwd_impl(
        d, wd, y_cond, sc, y, gy, gzs, gzq, gzc, with_stats, p
    )


fused_l1_layer.defvjp(_fused_l1_fwd_vjp, _fused_l1_bwd)


# ---------------------------------------------------------------------------
# Output layer: tanh(relu(k * yp + b) @ W + bias)
# ---------------------------------------------------------------------------


def _out_fwd_kernel_factory():
    def kernel(yp_ref, k_ref, b_ref, w_ref, bias_ref, y_ref):
        ni = pl.program_id(1)
        dt = yp_ref.dtype
        a = jnp.maximum(
            yp_ref[0, 0] * k_ref[0, ni][None, :].astype(dt)
            + b_ref[0, ni][None, :].astype(dt),
            0,
        )
        t = jax.lax.dot_general(
            a, w_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[0, ni][None, :]
        y_ref[0, 0] = jnp.tanh(t).astype(y_ref.dtype)

    return kernel


def _out_bwd_kernel_factory():
    def kernel(yp_ref, k_ref, b_ref, w_ref, bias_ref, y_ref, gy_ref,
               dyp_ref, dk_ref, db_ref, dw_ref, dbias_ref):
        ni = pl.program_id(1)
        t_idx = pl.program_id(2)
        dt = yp_ref.dtype
        y = y_ref[0, 0].astype(jnp.float32)
        gt = gy_ref[0, 0].astype(jnp.float32) * (1.0 - y * y)
        da = jax.lax.dot_general(
            gt.astype(dt), w_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        yp = yp_ref[0, 0]
        pre = yp * k_ref[0, ni][None, :].astype(dt) \
            + b_ref[0, ni][None, :].astype(dt)
        dm = jnp.where(pre.astype(jnp.float32) > 0, da, 0.0)
        dyp_ref[0, 0] = (dm * k_ref[0, ni][None, :]).astype(dt)
        a = jnp.maximum(pre, 0)
        dw = jax.lax.dot_general(
            a, gt.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(t_idx == 0)
        def _():
            dk_ref[0, ni] = jnp.zeros_like(dk_ref[0, ni])
            db_ref[0, ni] = jnp.zeros_like(db_ref[0, ni])
            dw_ref[0, 0] = jnp.zeros_like(dw_ref[0, 0])
            dbias_ref[0, ni] = jnp.zeros_like(dbias_ref[0, ni])

        dk_ref[0, ni] += jnp.sum(dm * yp.astype(jnp.float32), axis=0)
        db_ref[0, ni] += jnp.sum(dm, axis=0)
        dw_ref[0, 0] += dw
        dbias_ref[0, ni] += jnp.sum(gt, axis=0)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_out_layer(yp, k, b, w, bias, p: int):
    """tanh(relu(k*yp + b) @ w + bias): the node_conv4 output layer.

    Output is f32 (the decoder's point coordinates).
    """
    return _fused_out_fwd(yp, k, b, w, bias, p)


@functools.partial(jax.jit, static_argnames=("p",))
def _fused_out_fwd(yp, k, b, w, bias, p):
    c, nn_, r, din = yp.shape
    dout = w.shape[-1]
    tr = _row_tile(r, p)
    grid = (c, nn_, r // tr)
    return pl.pallas_call(
        _out_fwd_kernel_factory(),
        grid=grid,
        in_specs=_specs(c, nn_, tr, [
            ("rows", din), ("chan", din), ("chan", din),
            ("weight", (din, dout)), ("chan", dout),
        ]),
        out_specs=_specs(c, nn_, tr, [("rows", dout)])[0],
        out_shape=jax.ShapeDtypeStruct((c, nn_, r, dout), jnp.float32),
        interpret=interpret_default(),
    )(yp, k.astype(jnp.float32), b.astype(jnp.float32), w,
      bias.astype(jnp.float32))


def _fused_out_fwd_vjp(yp, k, b, w, bias, p):
    y = _fused_out_fwd(yp, k, b, w, bias, p)
    return y, (yp, k, b, w, bias, y)


@functools.partial(jax.jit, static_argnames=("p",))
def _fused_out_bwd_impl(yp, k, b, w, bias, y, gy, p):
    c, nn_, r, din = yp.shape
    dout = w.shape[-1]
    tr = _row_tile(r, p)
    grid = (c, nn_, r // tr)
    dyp, dk, db, dw, dbias = pl.pallas_call(
        _out_bwd_kernel_factory(),
        grid=grid,
        in_specs=_specs(c, nn_, tr, [
            ("rows", din), ("chan", din), ("chan", din),
            ("weight", (din, dout)), ("chan", dout),
            ("rows", dout), ("rows", dout),
        ]),
        out_specs=_specs(c, nn_, tr, [
            ("rows", din), ("chan", din), ("chan", din),
            ("weight", (din, dout)), ("chan", dout),
        ]),
        out_shape=[
            jax.ShapeDtypeStruct((c, nn_, r, din), yp.dtype),
            jax.ShapeDtypeStruct((c, nn_, din), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, din), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, din, dout), jnp.float32),
            jax.ShapeDtypeStruct((c, nn_, dout), jnp.float32),
        ],
        interpret=interpret_default(),
    )(yp, k.astype(jnp.float32), b.astype(jnp.float32), w,
      bias.astype(jnp.float32), y, gy.astype(jnp.float32))
    return dyp, dk.astype(k.dtype), db.astype(b.dtype), \
        dw.astype(w.dtype), dbias.astype(bias.dtype)


def _fused_out_bwd(p, res, gy):
    yp, k, b, w, bias, y = res
    return _fused_out_bwd_impl(yp, k, b, w, bias, y, gy, p)


fused_out_layer.defvjp(_fused_out_fwd_vjp, _fused_out_bwd)
