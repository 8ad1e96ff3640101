"""Pallas 3x3 SAME conv family (NHWC, stride 1) — the VGG conv primitive.

Replacement for the XLA conv on the VGG16-bn feature stack (reference
``src/models/image_net.py:13-24``): the r3 step trace puts the unpacked
VGG convs at 19.0 ms @135 TF/s with ~4 ms more of mid-block BatchNorm
statistics/affine passes around them. Owning the conv lets those BN
passes fold into the conv itself (the fused_stack.py treatment, for
convs):

  - PROLOGUE: the previous BN's affine(+relu) is applied in-register on
    the input block as it is loaded (``a = relu(k*x + b)`` in f32 with
    ONE cast to the compute dtype — in bf16 this is LSB-more precise
    than the unfused tensor path, which casts x/k/b to bf16 before the
    FMA), so the normalized tensor is never materialized;
  - EPILOGUE: the single-read shifted BN statistics of the raw output
    (``zsum/zsq of z = y - s``) accumulate before writeback, so the BN
    statistics pass never re-reads the conv output.

Formulation — flat-shifted taps, no im2col materialization:

Flatten the row-tile block's (rows, cols) to one axis of stride W
(the contiguous NHWC layout already IS this). Tap (dy, dx) of output
(r, w) reads input (r+dy-1, w+dx-1), i.e. flat offset
``(dy-1)*W + (dx-1)`` — so each tap is ONE contiguous static slice of
the flat axis and one MXU matmul

    acc[o] += x_flat[o + (dy+1)*W + dx - 1] @ Wk[dy, dx]

against a block that carries TWO halo rows above and below (the +1 row
bias makes every slice start non-negative). Two wrinkles carry the
SAME-padding semantics:

- tap dx=0 at w=0 would read the previous row's last column (and dx=2
  at w=W-1 the next row's first): those flat positions are exactly
  ``o % W == 0`` / ``o % W == W-1``, zero-masked on the sliced operand
  (iota masks built once, shared by the three taps of each dx).
- the halo rows beyond the image (block row 0/1 at the top tile, the
  last two at the bottom tile) are zero-masked whole; their BlockSpec
  indices are clamped to stay in range. With a prologue the mask runs
  AFTER the affine+relu (padding zeros are conv-input zeros, not
  affine inputs).

Row halos use separate 2-row refs with clamped index maps (Mosaic
forbids mixing Element/Blocked dims and requires lane/sublane-aligned
or full block dims, so an overlapping-window BlockSpec is not
expressible); the kernel concatenates [up2, mid, dn2] along the
outer row dim — vreg stacking, not a relayout. Lanes = channels
throughout; weights are passed as ``(9*Cin, Cout)`` so tap k's slice
starts at ``k*Cin``, a lane-tile-aligned sublane offset.

Backward: dgrad is the same conv kernel run on the adjusted cotangent
``gy_tot = gy + gzs + 2*(y-s)*gzq`` (the statistics cotangent fuses
into its prologue) with the rotated-transposed weights, and the
prologue's backward fuses into its epilogue (``gx = k * [a>0] * da``
plus the per-channel ``gk/gb`` reduces, grid-accumulated). wgrad is a
per-tap cross-correlation ``a_tap^T @ gy_tot`` with f32
grid-accumulation, recomputing ``a`` and ``gy_tot`` in its prologue.
So each big tensor is read exactly once per kernel that needs it and
the separate BN statistics/affine backward passes disappear.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops._pallas_utils import interpret_default


def _row_tile(h: int, w: int, cin: int, cout: int,
              budget: int = 12 * 1024 * 1024, esize: int = 2) -> int:
    """Largest row tile dividing ``h`` (even, for the 2-row halo refs)
    that keeps the kernel's VMEM working set inside the ~16 MB
    per-kernel scope (DESIGN.md §11.4): double-buffered x/out blocks,
    the static-unroll liveness of the 9 tap operands, the f32
    accumulator, and the weights. ``esize`` is the compute dtype's
    bytes/element (2 for the bf16 production path)."""
    wk = 9 * cin * cout * esize
    for cand in (32, 28, 16, 14, 8, 4, 2):
        if h % cand:
            continue
        xblk = 2 * (cand + 4) * w * cin * esize
        oblk = 2 * cand * w * cout * esize
        taps = 9 * cand * w * cin * esize
        acc = cand * w * cout * 4
        if wk + xblk + oblk + taps + acc < budget:
            return cand
    return 2


def _halo_maps(th: int, h2: int):
    assert th % 2 == 0, (
        "row tiles must be even: the halo refs index in 2-row units "
        f"(got {th}) — an odd tile silently fetches wrong halo rows")

    def up_map(bi, t):
        # rows [t*th-2, t*th) in 2-row units, clamped; masked at t==0.
        return (bi, jnp.maximum(t * (th // 2) - 1, 0), 0, 0, 0)

    def dn_map(bi, t):
        # rows [t*th+th, t*th+th+2), clamped; masked at t==nt-1.
        return (bi, jnp.minimum((t + 1) * (th // 2), h2 - 1), 0, 0, 0)

    return up_map, dn_map


def _mask_halo_rows(xb, t, nt, th: int):
    """Re-zero the out-of-image halo rows of a (th+4, w, c) assembly
    whose values were regenerated after _assemble (prologue affine,
    statistics adjustment): rows 0..1 at the top tile, th+2..th+3 at
    the bottom tile."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (th + 4, 1, 1), 0)
    rlo = jnp.where(t == 0, 2, 0)
    rhi = jnp.where(t == nt - 1, th + 1, th + 3)
    keep = (rows >= rlo) & (rows <= rhi)
    return jnp.where(keep, xb, jnp.zeros((), xb.dtype))


def _assemble(up_ref, mid_ref, dn_ref, t, nt):
    """[up2, mid, dn2] with the out-of-image halo rows zeroed."""
    zero = jnp.zeros((), mid_ref.dtype)
    up = jnp.where(t == 0, zero, up_ref[0, 0])       # (2, w, cin)
    dn = jnp.where(t == nt - 1, zero, dn_ref[0, 0])  # (2, w, cin)
    return jnp.concatenate([up, mid_ref[0], dn], axis=0)


def _width_masks(l: int, w: int):
    """Flat-axis masks for the width-crossing taps: o % W == 0 is a
    row's first column (garbage for dx=0), o % W == W-1 its last
    (garbage for dx=2)."""
    o_mod = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0), w)
    return o_mod != 0, o_mod != (w - 1)


def _tap_mm(xf, w_ref, l: int, w: int, cin: int, cout: int,
            not_first, not_last):
    """The 9 flat-shifted tap matmuls with f32 accumulation."""
    zero = jnp.zeros((), xf.dtype)
    acc = jnp.zeros((l, cout), jnp.float32)
    for k in range(9):
        dy, dx = k // 3, k % 3
        s = (dy + 1) * w + dx - 1
        a = xf[s:s + l]
        if dx == 0:
            a = jnp.where(not_first, a, zero)
        elif dx == 2:
            a = jnp.where(not_last, a, zero)
        acc = acc + jnp.dot(
            a, w_ref[k * cin:(k + 1) * cin],
            preferred_element_type=jnp.float32,
        )
    return acc


def _tap_wgrad(af, g, dw_ref, l: int, w: int, cin: int,
               not_first, not_last):
    """The 9 per-tap wgrad cross-correlations, accumulated into the
    grid-persistent (9*Cin, Cout) f32 ref."""
    zero = jnp.zeros((), af.dtype)
    for k in range(9):
        dy, dx = k // 3, k % 3
        s_off = (dy + 1) * w + dx - 1
        a = af[s_off:s_off + l]
        if dx == 0:
            a = jnp.where(not_first, a, zero)
        elif dx == 2:
            a = jnp.where(not_last, a, zero)
        dw_ref[k * cin:(k + 1) * cin] += jax.lax.dot_general(
            a, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


# ---------------------------------------------------------------------------
# Forward: [prologue affine+relu] -> conv -> [epilogue statistics]
# ---------------------------------------------------------------------------


def _fwd_kernel_factory(th: int, w: int, cin: int, cout: int,
                        has_pro: bool, has_epi: bool):
    l = th * w

    def kernel(*refs):
        it = iter(refs)
        up_ref, mid_ref, dn_ref = next(it), next(it), next(it)
        if has_pro:
            k_ref, b_ref = next(it), next(it)
        w_ref = next(it)
        if has_epi:
            s_ref = next(it)
        o_ref = next(it)
        if has_epi:
            zs_ref, zq_ref = next(it), next(it)

        bi = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        xb = _assemble(up_ref, mid_ref, dn_ref, t, nt)
        if has_pro:
            # f32 affine+relu, one cast to the compute dtype. (The
            # unfused bf16 tensor path double-rounds — it casts x/k/b
            # to bf16 BEFORE the FMA — so in bf16 this is LSB-more
            # precise, not bitwise-equal; the f32 equivalence tests
            # coincide exactly.)
            act = jnp.maximum(
                xb.astype(jnp.float32) * k_ref[0][None, None, :]
                + b_ref[0][None, None, :], 0.0)
            # re-zero the halo rows (relu(b) != 0)
            xb = _mask_halo_rows(act.astype(xb.dtype), t, nt, th)
        xf = xb.reshape((th + 4) * w, cin)
        not_first, not_last = _width_masks(l, w)
        acc = _tap_mm(xf, w_ref, l, w, cin, cout, not_first, not_last)
        y = acc.astype(o_ref.dtype)
        o_ref[0, 0] = y
        if has_epi:
            @pl.when(jnp.logical_and(bi == 0, t == 0))
            def _():
                zs_ref[...] = jnp.zeros_like(zs_ref)
                zq_ref[...] = jnp.zeros_like(zq_ref)

            # statistics of the STORED (cast) output — identical element
            # set and values as the unfused BN statistics read.
            z = y.astype(jnp.float32) - s_ref[0][None, :]
            zs_ref[0] += jnp.sum(z, axis=0)
            zq_ref[0] += jnp.sum(z * z, axis=0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("has_pro", "has_epi", "interpret", "row_tile"))
def _conv_fwd_pallas(x, kin, bin_, wk, s, has_pro, has_epi, interpret,
                     row_tile=None):
    """x (B, H, W, Cin), wk (9*Cin, Cout) -> y (B, H, W, Cout)
    [+ zsum, zsq (Cout,) f32 when has_epi]."""
    b, h, w, cin = x.shape
    cout = wk.shape[1]
    th = row_tile or _row_tile(h, w, cin, cout, esize=x.dtype.itemsize)
    nt = h // th
    up_map, dn_map = _halo_maps(th, h // 2)
    vm = pltpu.VMEM
    chan = lambda c: pl.BlockSpec((1, c), lambda bi, t: (0, 0),
                                  memory_space=vm)
    x5 = x.reshape(b, h // 2, 2, w, cin)

    in_specs = [
        pl.BlockSpec((1, 1, 2, w, cin), up_map, memory_space=vm),
        pl.BlockSpec((1, th, w, cin), lambda bi, t: (bi, t, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, 1, 2, w, cin), dn_map, memory_space=vm),
    ]
    args = [x5, x, x5]
    if has_pro:
        in_specs += [chan(cin), chan(cin)]
        args += [kin.reshape(1, cin).astype(jnp.float32),
                 bin_.reshape(1, cin).astype(jnp.float32)]
    in_specs.append(pl.BlockSpec((9 * cin, cout), lambda bi, t: (0, 0),
                                 memory_space=vm))
    args.append(wk)
    out_specs = [pl.BlockSpec((1, 1, th * w, cout),
                              lambda bi, t: (bi, t, 0, 0),
                              memory_space=vm)]
    out_shape = [jax.ShapeDtypeStruct((b, nt, th * w, cout), x.dtype)]
    if has_epi:
        in_specs.append(chan(cout))
        args.append(s.reshape(1, cout).astype(jnp.float32))
        out_specs += [chan(cout), chan(cout)]
        out_shape += [jax.ShapeDtypeStruct((1, cout), jnp.float32)] * 2

    res = pl.pallas_call(
        _fwd_kernel_factory(th, w, cin, cout, has_pro, has_epi),
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    y = res[0].reshape(b, h, w, cout)
    if has_epi:
        return y, res[1][0], res[2][0]
    return y, None, None


# ---------------------------------------------------------------------------
# dgrad: [stats-cotangent prologue] -> conv(rot W) -> [affine-bwd epilogue]
# ---------------------------------------------------------------------------


def _dgrad_kernel_factory(th: int, w: int, cin: int, cout: int,
                          has_pro: bool, has_epi: bool):
    l = th * w

    def kernel(*refs):
        it = iter(refs)
        gup, gmid, gdn = next(it), next(it), next(it)
        if has_epi:
            yup, ymid, ydn = next(it), next(it), next(it)
            s_ref, gzs_ref, gzq_ref = next(it), next(it), next(it)
        if has_pro:
            x_ref, k_ref, b_ref = next(it), next(it), next(it)
        w_ref = next(it)
        gx_ref = next(it)
        if has_pro:
            gk_ref, gb_ref = next(it), next(it)

        bi = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        gb_blk = _assemble(gup, gmid, gdn, t, nt)
        if has_epi:
            # gy_tot = gy + gzs + 2*(y - s)*gzq on the halo assembly
            yb = _assemble(yup, ymid, ydn, t, nt).astype(jnp.float32)
            adj = (gzs_ref[0][None, None, :]
                   + 2.0 * (yb - s_ref[0][None, None, :])
                   * gzq_ref[0][None, None, :])
            gt = gb_blk.astype(jnp.float32) + adj
            # the adjustment must not resurrect out-of-image halo rows
            gb_blk = _mask_halo_rows(gt, t, nt, th).astype(gb_blk.dtype)
        gf = gb_blk.reshape((th + 4) * w, cout)
        not_first, not_last = _width_masks(l, w)
        da = _tap_mm(gf, w_ref, l, w, cout, cin, not_first, not_last)

        if has_pro:
            x = x_ref[0, 0].astype(jnp.float32)          # (l, cin)
            k = k_ref[0][None, :]
            pre = x * k + b_ref[0][None, :]
            gm = jnp.where(pre > 0.0, da, 0.0)

            @pl.when(jnp.logical_and(bi == 0, t == 0))
            def _():
                gk_ref[...] = jnp.zeros_like(gk_ref)
                gb_ref[...] = jnp.zeros_like(gb_ref)

            gk_ref[0] += jnp.sum(gm * x, axis=0)
            gb_ref[0] += jnp.sum(gm, axis=0)
            gx_ref[0, 0] = (gm * k).astype(gx_ref.dtype)
        else:
            gx_ref[0, 0] = da.astype(gx_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("has_pro", "has_epi", "interpret", "row_tile"))
def _conv_dgrad_pallas(gy, y, x, kin, bin_, wkr, s, gzs, gzq,
                       has_pro, has_epi, interpret, row_tile=None):
    """Adjusted-cotangent conv with the rotated weights; returns
    (gx, gk, gb) — gk/gb None unless has_pro."""
    b, h, w, cout = gy.shape
    cin = wkr.shape[1]
    th = row_tile or _row_tile(h, w, cout, cin, budget=9 * 1024 * 1024,
                               esize=gy.dtype.itemsize)
    nt = h // th
    up_map, dn_map = _halo_maps(th, h // 2)
    vm = pltpu.VMEM
    chan = lambda c: pl.BlockSpec((1, c), lambda bi, t: (0, 0),
                                  memory_space=vm)
    halo = lambda c, m: pl.BlockSpec((1, 1, 2, w, c), m, memory_space=vm)
    mid = lambda c: pl.BlockSpec((1, th, w, c), lambda bi, t: (bi, t, 0, 0),
                                 memory_space=vm)
    g5 = gy.reshape(b, h // 2, 2, w, cout)

    in_specs = [halo(cout, up_map), mid(cout), halo(cout, dn_map)]
    args = [g5, gy, g5]
    if has_epi:
        y5 = y.reshape(b, h // 2, 2, w, cout)
        in_specs += [halo(cout, up_map), mid(cout), halo(cout, dn_map),
                     chan(cout), chan(cout), chan(cout)]
        args += [y5, y, y5,
                 s.reshape(1, cout).astype(jnp.float32),
                 gzs.reshape(1, cout).astype(jnp.float32),
                 gzq.reshape(1, cout).astype(jnp.float32)]
    if has_pro:
        in_specs += [
            pl.BlockSpec((1, 1, th * w, cin), lambda bi, t: (bi, t, 0, 0),
                         memory_space=vm),
            chan(cin), chan(cin)]
        args += [x.reshape(b, nt, th * w, cin),
                 kin.reshape(1, cin).astype(jnp.float32),
                 bin_.reshape(1, cin).astype(jnp.float32)]
    in_specs.append(pl.BlockSpec((9 * cout, cin), lambda bi, t: (0, 0),
                                 memory_space=vm))
    args.append(wkr)
    out_specs = [pl.BlockSpec((1, 1, th * w, cin),
                              lambda bi, t: (bi, t, 0, 0),
                              memory_space=vm)]
    out_shape = [jax.ShapeDtypeStruct((b, nt, th * w, cin), gy.dtype)]
    if has_pro:
        out_specs += [chan(cin), chan(cin)]
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 2

    res = pl.pallas_call(
        _dgrad_kernel_factory(th, w, cin, cout, has_pro, has_epi),
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    gx = res[0].reshape(b, h, w, cin)
    if has_pro:
        return gx, res[1][0], res[2][0]
    return gx, None, None


# ---------------------------------------------------------------------------
# wgrad: per-tap cross-correlation, f32 grid-accumulated
# ---------------------------------------------------------------------------


def _wgrad_kernel_factory(th: int, w: int, cin: int, cout: int,
                          has_pro: bool, has_epi: bool):
    l = th * w

    def kernel(*refs):
        it = iter(refs)
        up_ref, mid_ref, dn_ref = next(it), next(it), next(it)
        if has_pro:
            k_ref, b_ref = next(it), next(it)
        g_ref = next(it)
        if has_epi:
            y_ref, s_ref, gzs_ref, gzq_ref = (
                next(it), next(it), next(it), next(it))
        dw_ref = next(it)

        bi = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when(jnp.logical_and(bi == 0, t == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        xb = _assemble(up_ref, mid_ref, dn_ref, t, nt)
        if has_pro:
            act = jnp.maximum(
                xb.astype(jnp.float32) * k_ref[0][None, None, :]
                + b_ref[0][None, None, :], 0.0)
            xb = _mask_halo_rows(act.astype(xb.dtype), t, nt, th)
        xf = xb.reshape((th + 4) * w, cin)
        g = g_ref[0, 0]                                  # (l, cout)
        if has_epi:
            z = y_ref[0, 0].astype(jnp.float32) - s_ref[0][None, :]
            g = (g.astype(jnp.float32) + gzs_ref[0][None, :]
                 + 2.0 * z * gzq_ref[0][None, :]).astype(g.dtype)

        not_first, not_last = _width_masks(l, w)
        _tap_wgrad(xf, g, dw_ref, l, w, cin, not_first, not_last)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("has_pro", "has_epi", "interpret", "row_tile"))
def _conv_wgrad_pallas(x, kin, bin_, gy, y, s, gzs, gzq,
                       has_pro, has_epi, interpret, row_tile=None):
    """dW (9*Cin, Cout) f32: per-tap cross-correlation of the
    (recomputed) activated input with the (adjusted) cotangent,
    grid-accumulated in one VMEM-resident f32 buffer (the out index
    map is constant, so the block persists across the whole
    sequential grid)."""
    b, h, w, cin = x.shape
    cout = gy.shape[-1]
    th = row_tile or _row_tile(h, w, cin, cout, budget=9 * 1024 * 1024,
                               esize=x.dtype.itemsize)
    nt = h // th
    up_map, dn_map = _halo_maps(th, h // 2)
    vm = pltpu.VMEM
    chan = lambda c: pl.BlockSpec((1, c), lambda bi, t: (0, 0),
                                  memory_space=vm)
    flat = lambda c: pl.BlockSpec((1, 1, th * w, c),
                                  lambda bi, t: (bi, t, 0, 0),
                                  memory_space=vm)
    x5 = x.reshape(b, h // 2, 2, w, cin)

    in_specs = [
        pl.BlockSpec((1, 1, 2, w, cin), up_map, memory_space=vm),
        pl.BlockSpec((1, th, w, cin), lambda bi, t: (bi, t, 0, 0),
                     memory_space=vm),
        pl.BlockSpec((1, 1, 2, w, cin), dn_map, memory_space=vm),
    ]
    args = [x5, x, x5]
    if has_pro:
        in_specs += [chan(cin), chan(cin)]
        args += [kin.reshape(1, cin).astype(jnp.float32),
                 bin_.reshape(1, cin).astype(jnp.float32)]
    in_specs.append(flat(cout))
    args.append(gy.reshape(b, nt, th * w, cout))
    if has_epi:
        in_specs += [flat(cout), chan(cout), chan(cout), chan(cout)]
        args += [y.reshape(b, nt, th * w, cout),
                 s.reshape(1, cout).astype(jnp.float32),
                 gzs.reshape(1, cout).astype(jnp.float32),
                 gzq.reshape(1, cout).astype(jnp.float32)]

    return pl.pallas_call(
        _wgrad_kernel_factory(th, w, cin, cout, has_pro, has_epi),
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((9 * cin, cout), lambda bi, t: (0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Combined backward: dgrad + wgrad (+ affine bwd + stats adjust) in ONE
# kernel — x, gy, y are each read once instead of once per split kernel.
# ---------------------------------------------------------------------------


def _combined_row_tile(h: int, w: int, cin: int, cout: int,
                       esize: int = 2):
    """Row tile for the combined backward, or None when its VMEM
    working set (BOTH weight/dW planes + three halo assemblies + two
    tap-unroll livenesses) cannot fit the ~16 MB scope — the 512-ch
    blocks stay on the split kernels."""
    fixed = 9 * cout * cin * esize + 9 * cin * cout * 4   # wkr + dW
    budget = 13 * 1024 * 1024
    for cand in (32, 28, 16, 14, 8, 4, 2):
        if h % cand:
            continue
        l = cand * w
        asm = 2 * (cand + 4) * w * (cin + 2 * cout) * esize  # x + gy + y
        gt = (cand + 4) * w * cout * (4 + esize)             # f32 + cast
        a = (cand + 4) * w * cin * esize
        taps = 9 * l * (cout + cin) * esize
        acc = l * cin * 4
        gx = 2 * l * cin * esize
        if fixed + asm + gt + a + taps + acc + gx < budget:
            return cand
    return None


def _cbwd_kernel_factory(th: int, w: int, cin: int, cout: int,
                         has_pro: bool, has_epi: bool):
    l = th * w

    def kernel(*refs):
        it = iter(refs)
        gup, gmid, gdn = next(it), next(it), next(it)
        if has_epi:
            yup, ymid, ydn = next(it), next(it), next(it)
            s_ref, gzs_ref, gzq_ref = next(it), next(it), next(it)
        xup, xmid, xdn = next(it), next(it), next(it)
        if has_pro:
            k_ref, b_ref = next(it), next(it)
        w_ref = next(it)
        gx_ref = next(it)
        if has_pro:
            gk_ref, gb_ref = next(it), next(it)
        dw_ref = next(it)

        bi = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when(jnp.logical_and(bi == 0, t == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            if has_pro:
                gk_ref[...] = jnp.zeros_like(gk_ref)
                gb_ref[...] = jnp.zeros_like(gb_ref)

        # adjusted cotangent on the halo assembly (shared by both passes)
        gb_blk = _assemble(gup, gmid, gdn, t, nt)
        if has_epi:
            yb = _assemble(yup, ymid, ydn, t, nt).astype(jnp.float32)
            adj = (gzs_ref[0][None, None, :]
                   + 2.0 * (yb - s_ref[0][None, None, :])
                   * gzq_ref[0][None, None, :])
            gt_ = gb_blk.astype(jnp.float32) + adj
            gb_blk = _mask_halo_rows(gt_, t, nt, th).astype(gb_blk.dtype)
        gf = gb_blk.reshape((th + 4) * w, cout)

        # activated input on the halo assembly (wgrad operand; its mid
        # rows also serve the affine backward)
        xb = _assemble(xup, xmid, xdn, t, nt)
        if has_pro:
            act = jnp.maximum(
                xb.astype(jnp.float32) * k_ref[0][None, None, :]
                + b_ref[0][None, None, :], 0.0)
            ab = _mask_halo_rows(act.astype(xb.dtype), t, nt, th)
        else:
            ab = xb
        af = ab.reshape((th + 4) * w, cin)

        not_first, not_last = _width_masks(l, w)
        da = _tap_mm(gf, w_ref, l, w, cout, cin, not_first, not_last)

        g_mid = gf[2 * w:2 * w + l]
        _tap_wgrad(af, g_mid, dw_ref, l, w, cin, not_first, not_last)

        if has_pro:
            x = xb.reshape((th + 4) * w, cin)[2 * w:2 * w + l].astype(
                jnp.float32)
            k = k_ref[0][None, :]
            pre = x * k + b_ref[0][None, :]
            gm = jnp.where(pre > 0.0, da, 0.0)
            gk_ref[0] += jnp.sum(gm * x, axis=0)
            gb_ref[0] += jnp.sum(gm, axis=0)
            gx_ref[0, 0] = (gm * k).astype(gx_ref.dtype)
        else:
            gx_ref[0, 0] = da.astype(gx_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("has_pro", "has_epi", "interpret", "row_tile"))
def _conv_cbwd_pallas(gy, y, x, kin, bin_, wkr, s, gzs, gzq,
                      has_pro, has_epi, interpret, row_tile):
    """One-kernel backward: returns (gx, gk, gb, dW)."""
    b, h, w, cout = gy.shape
    cin = x.shape[-1]
    th = row_tile
    nt = h // th
    up_map, dn_map = _halo_maps(th, h // 2)
    vm = pltpu.VMEM
    chan = lambda c: pl.BlockSpec((1, c), lambda bi, t: (0, 0),
                                  memory_space=vm)
    halo = lambda c, m: pl.BlockSpec((1, 1, 2, w, c), m, memory_space=vm)
    mid = lambda c: pl.BlockSpec((1, th, w, c), lambda bi, t: (bi, t, 0, 0),
                                 memory_space=vm)
    g5 = gy.reshape(b, h // 2, 2, w, cout)
    x5 = x.reshape(b, h // 2, 2, w, cin)

    in_specs = [halo(cout, up_map), mid(cout), halo(cout, dn_map)]
    args = [g5, gy, g5]
    if has_epi:
        y5 = y.reshape(b, h // 2, 2, w, cout)
        in_specs += [halo(cout, up_map), mid(cout), halo(cout, dn_map),
                     chan(cout), chan(cout), chan(cout)]
        args += [y5, y, y5,
                 s.reshape(1, cout).astype(jnp.float32),
                 gzs.reshape(1, cout).astype(jnp.float32),
                 gzq.reshape(1, cout).astype(jnp.float32)]
    in_specs += [halo(cin, up_map), mid(cin), halo(cin, dn_map)]
    args += [x5, x, x5]
    if has_pro:
        in_specs += [chan(cin), chan(cin)]
        args += [kin.reshape(1, cin).astype(jnp.float32),
                 bin_.reshape(1, cin).astype(jnp.float32)]
    in_specs.append(pl.BlockSpec((9 * cout, cin), lambda bi, t: (0, 0),
                                 memory_space=vm))
    args.append(wkr)

    out_specs = [pl.BlockSpec((1, 1, th * w, cin),
                              lambda bi, t: (bi, t, 0, 0),
                              memory_space=vm)]
    out_shape = [jax.ShapeDtypeStruct((b, nt, th * w, cin), gy.dtype)]
    if has_pro:
        out_specs += [chan(cin), chan(cin)]
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32)] * 2
    out_specs.append(pl.BlockSpec((9 * cin, cout), lambda bi, t: (0, 0),
                                  memory_space=vm))
    out_shape.append(jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32))

    res = pl.pallas_call(
        _cbwd_kernel_factory(th, w, cin, cout, has_pro, has_epi),
        grid=(b, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    gx = res[0].reshape(b, h, w, cin)
    if has_pro:
        return gx, res[1][0], res[2][0], res[3]
    return gx, None, None, res[-1]


# ---------------------------------------------------------------------------
# Differentiable entry points
# ---------------------------------------------------------------------------


def _rot180_swap(wk: jax.Array, cin: int, cout: int) -> jax.Array:
    """(9*Cin, Cout) tap-major weights -> the dgrad weights
    (9*Cout, Cin): tap (dy, dx) -> (2-dy, 2-dx), io transposed."""
    w9 = wk.reshape(3, 3, cin, cout)
    return w9[::-1, ::-1].transpose(0, 1, 3, 2).reshape(9 * cout, cin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv_bn_fused(x, kin, bin_, wk, s,
                  has_pro: bool, has_epi: bool, interpret: bool):
    """Fused [affine+relu ->] 3x3 SAME conv [-> BN statistics].

    x (B, H, W, Cin) raw previous-layer output; kin/bin (Cin,) f32 the
    previous BN's collapsed affine (ignored when ``has_pro=False``);
    wk (9*Cin, Cout) tap-major weights; s (Cout,) f32 the output BN's
    stop-gradient stat shift (ignored when ``has_epi=False``).

    Returns ``(y, zsum, zsq)`` — zsum/zsq are (Cout,) f32 sums of
    ``z = y - s`` and ``z*z`` over all B*H*W positions (None-shaped
    zeros when ``has_epi=False``). ``s`` gets zero cotangent (it is
    stop-gradient at every call site, like pool_moments)."""
    y, zs, zq = _conv_fwd_pallas(x, kin, bin_, wk, s, has_pro, has_epi,
                                 interpret)
    if not has_epi:
        cout = wk.shape[1]
        zs = jnp.zeros((cout,), jnp.float32)
        zq = jnp.zeros((cout,), jnp.float32)
    return y, zs, zq


def _cbf_fwd(x, kin, bin_, wk, s, has_pro, has_epi, interpret):
    out = conv_bn_fused(x, kin, bin_, wk, s, has_pro, has_epi, interpret)
    return out, (x, kin, bin_, wk, s, out[0])


def _cbf_bwd(has_pro, has_epi, interpret, res, cots):
    x, kin, bin_, wk, s, y = res
    gy, gzs, gzq = cots
    cin, cout = wk.shape[0] // 9, wk.shape[1]
    gy = gy.astype(y.dtype)
    b, h, w = gy.shape[:3]
    # Combined kernel only where it measures faster than split dgrad +
    # wgrad: the 128-ch VGG shapes (BASELINE.md round-3c conv probe —
    # 9.2 vs 12.9 ms at (224,112,128,128), 5.3 vs 8.0 at (112,112,128²);
    # at 256 ch it collapses to 23 TF/s, 3x slower than split).
    th = (_combined_row_tile(h, w, cin, cout, esize=gy.dtype.itemsize)
          if max(cin, cout) <= 128 else None)
    if th is not None:
        gx, gk, gb, dw = _conv_cbwd_pallas(
            gy, y, x, kin, bin_, _rot180_swap(wk, cin, cout), s, gzs, gzq,
            has_pro, has_epi, interpret, th)
        dw = dw.astype(wk.dtype)
    else:
        gx, gk, gb = _conv_dgrad_pallas(
            gy, y, x, kin, bin_, _rot180_swap(wk, cin, cout), s, gzs, gzq,
            has_pro, has_epi, interpret)
        dw = _conv_wgrad_pallas(
            x, kin, bin_, gy, y, s, gzs, gzq, has_pro, has_epi, interpret
        ).astype(wk.dtype)
    if not has_pro:
        gk = jnp.zeros_like(kin)
        gb = jnp.zeros_like(bin_)
    return gx, gk.astype(kin.dtype), gb.astype(bin_.dtype), dw, \
        jnp.zeros_like(s)


conv_bn_fused.defvjp(_cbf_fwd, _cbf_bwd)


def conv3x3(x: jax.Array, wk: jax.Array, interpret: bool = False):
    """Differentiable plain 3x3 SAME conv on tap-major weights
    ``wk (9*Cin, Cout)`` (no prologue/epilogue)."""
    cout = wk.shape[1]
    z = jnp.zeros((cout,), jnp.float32)
    dummy = jnp.zeros((x.shape[-1],), jnp.float32)
    y, _, _ = conv_bn_fused(x, dummy, dummy, wk, z, False, False, interpret)
    return y


def conv3x3_same(x: jax.Array, w: jax.Array, *, interpret=None,
                 row_tile=None) -> jax.Array:
    """3x3 SAME stride-1 conv: x (B, H, W, Cin), w (3, 3, Cin, Cout)
    -> (B, H, W, Cout). Non-differentiable probe entry (row_tile
    override for the sweep)."""
    cin = x.shape[-1]
    wk = w.reshape(9 * cin, -1).astype(x.dtype)
    if interpret is None:
        interpret = interpret_default()
    dummy = jnp.zeros((cin,), jnp.float32)
    z = jnp.zeros((wk.shape[1],), jnp.float32)
    y, _, _ = _conv_fwd_pallas(x, dummy, dummy, wk, z, False, False,
                               interpret, row_tile)
    return y


def conv3x3_oracle(x: jax.Array, w: jax.Array) -> jax.Array:
    """XLA reference (identical semantics)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
