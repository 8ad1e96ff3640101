"""Pallas 3x3 SAME conv (NHWC, stride 1) — the VGG conv primitive.

Probe/replacement for the XLA conv on the VGG16-bn feature stack
(reference ``src/models/image_net.py:13-24``): the r3 step trace puts
the unpacked VGG convs at 19.0 ms @135 TF/s with ~4 ms more of
mid-block BatchNorm statistics/affine passes around them. A first-party
conv kernel is the prerequisite for folding those BN passes into the
conv prologue/epilogue (the fused_stack.py treatment, but for convs).

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
  indices are clamped to stay in range.

Row halos use separate 2-row refs with clamped index maps (Mosaic
forbids mixing Element/Blocked dims and requires lane/sublane-aligned
or full block dims, so an overlapping-window BlockSpec is not
expressible); the kernel concatenates [up2, mid, dn2] along the
outer row dim — vreg stacking, not a relayout. Lanes = channels
throughout; weights are passed as ``(9*Cin, Cout)`` so tap k's slice
starts at ``k*Cin``, a lane-tile-aligned sublane offset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops._pallas_utils import interpret_default


def _row_tile(h: int, w: int, cin: int, cout: int) -> int:
    """Largest row tile dividing ``h`` (even, for the 2-row halo refs)
    that keeps the kernel's VMEM working set inside the ~16 MB
    per-kernel scope (DESIGN.md §11.4): double-buffered x/out blocks,
    the static-unroll liveness of the 9 tap operands, the f32
    accumulator, and the weights."""
    budget = 12 * 1024 * 1024
    wk = 9 * cin * cout * 2
    for cand in (32, 28, 16, 14, 8, 4, 2):
        if h % cand:
            continue
        xblk = 2 * (cand + 4) * w * cin * 2
        oblk = 2 * cand * w * cout * 2
        taps = 9 * cand * w * cin * 2
        acc = cand * w * cout * 4
        if wk + xblk + oblk + taps + acc < budget:
            return cand
    return 2


def _fwd_kernel_factory(th: int, w: int, cin: int, cout: int):
    l = th * w

    def kernel(up_ref, mid_ref, dn_ref, w_ref, o_ref):
        t = pl.program_id(1)
        nt = pl.num_programs(1)
        zero = jnp.zeros((), mid_ref.dtype)
        up = jnp.where(t == 0, zero, up_ref[0, 0])       # (2, w, cin)
        dn = jnp.where(t == nt - 1, zero, dn_ref[0, 0])  # (2, w, cin)
        xb = jnp.concatenate([up, mid_ref[0], dn], axis=0)
        xf = xb.reshape((th + 4) * w, cin)

        # width-pad masks on the flat axis: o % W == 0 is a row's first
        # column (garbage for the dx=0 taps), o % W == W-1 its last
        # (garbage for dx=2).
        o_mod = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0), w)
        not_first = o_mod != 0
        not_last = o_mod != (w - 1)

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
        o_ref[0, 0] = acc.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_tile"))
def _conv_fwd_pallas(x, wk, interpret, row_tile=None):
    """x (B, H, W, Cin), wk (9*Cin, Cout) -> (B, H*W flat per row-tile,
    Cout), reshaped by the caller to (B, H, W, Cout)."""
    b, h, w, cin = x.shape
    cout = wk.shape[1]
    th = row_tile or _row_tile(h, w, cin, cout)
    nt = h // th
    h2 = h // 2

    def mid_map(bi, t):
        return (bi, t, 0, 0)

    def up_map(bi, t):
        # rows [t*th-2, t*th) in 2-row units, clamped; masked at t==0.
        return (bi, jnp.maximum(t * (th // 2) - 1, 0), 0, 0, 0)

    def dn_map(bi, t):
        # rows [t*th+th, t*th+th+2), clamped; masked at t==nt-1.
        return (bi, jnp.minimum((t + 1) * (th // 2), h2 - 1), 0, 0, 0)

    out = pl.pallas_call(
        _fwd_kernel_factory(th, w, cin, cout),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 2, w, cin), up_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, cin), mid_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w, cin), dn_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, th * w, cout),
                               lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nt, th * w, cout), x.dtype),
        interpret=interpret,
    )(x.reshape(b, h2, 2, w, cin), x, x.reshape(b, h2, 2, w, cin), wk)
    return out.reshape(b, h, w, cout)


def conv3x3_same(x: jax.Array, w: jax.Array, *, interpret=None,
                 row_tile=None) -> jax.Array:
    """3x3 SAME stride-1 conv: x (B, H, W, Cin), w (3, 3, Cin, Cout)
    -> (B, H, W, Cout). Forward-only Pallas path (probe / fused-chain
    building block); the differentiable integration wires a custom VJP
    on top."""
    cin = x.shape[-1]
    wk = w.reshape(9 * cin, -1).astype(x.dtype)
    if interpret is None:
        interpret = interpret_default()
    return _conv_fwd_pallas(x, wk, interpret, row_tile)


def _wgrad_kernel_factory(th: int, w: int, cin: int, cout: int):
    l = th * w

    def kernel(up_ref, mid_ref, dn_ref, g_ref, dw_ref):
        bi = pl.program_id(0)
        t = pl.program_id(1)
        nt = pl.num_programs(1)

        @pl.when(jnp.logical_and(bi == 0, t == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        zero = jnp.zeros((), mid_ref.dtype)
        up = jnp.where(t == 0, zero, up_ref[0, 0])
        dn = jnp.where(t == nt - 1, zero, dn_ref[0, 0])
        xb = jnp.concatenate([up, mid_ref[0], dn], axis=0)
        xf = xb.reshape((th + 4) * w, cin)
        g = g_ref[0, 0]                                   # (l, cout)

        o_mod = jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0), w)
        not_first = o_mod != 0
        not_last = o_mod != (w - 1)

        for k in range(9):
            dy, dx = k // 3, k % 3
            s = (dy + 1) * w + dx - 1
            a = xf[s:s + l]
            if dx == 0:
                a = jnp.where(not_first, a, zero)
            elif dx == 2:
                a = jnp.where(not_last, a, zero)
            dw_ref[k * cin:(k + 1) * cin] += jax.lax.dot_general(
                a, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "row_tile"))
def _conv_wgrad_pallas(x, gy, interpret, row_tile=None):
    """x (B, H, W, Cin), gy (B, H, W, Cout) -> dW (9*Cin, Cout) f32:
    per-tap cross-correlation, grid-accumulated in one VMEM-resident
    f32 buffer (the out index map is constant, so the block persists
    across the whole sequential grid)."""
    b, h, w, cin = x.shape
    cout = gy.shape[-1]
    th = row_tile or _row_tile(h, w, cin, cout)
    nt = h // th
    h2 = h // 2

    def up_map(bi, t):
        return (bi, jnp.maximum(t * (th // 2) - 1, 0), 0, 0, 0)

    def dn_map(bi, t):
        return (bi, jnp.minimum((t + 1) * (th // 2), h2 - 1), 0, 0, 0)

    return pl.pallas_call(
        _wgrad_kernel_factory(th, w, cin, cout),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 2, w, cin), up_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, cin), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w, cin), dn_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, th * w, cout), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda bi, t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        interpret=interpret,
    )(x.reshape(b, h2, 2, w, cin), x, x.reshape(b, h2, 2, w, cin),
      gy.reshape(b, nt, th * w, cout))


def _rot180_swap(wk: jax.Array, cin: int, cout: int) -> jax.Array:
    """(9*Cin, Cout) tap-major weights -> the dgrad weights
    (9*Cout, Cin): tap (dy, dx) -> (2-dy, 2-dx), io transposed."""
    w9 = wk.reshape(3, 3, cin, cout)
    return w9[::-1, ::-1].transpose(0, 1, 3, 2).reshape(9 * cout, cin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3(x: jax.Array, wk: jax.Array, interpret: bool = False):
    """Differentiable 3x3 SAME conv on tap-major weights
    ``wk (9*Cin, Cout)``: forward/dgrad share the flat-tap kernel
    (dgrad is the same conv with the rotated-transposed weights);
    wgrad is the per-tap cross-correlation kernel with f32
    grid-accumulation."""
    return _conv_fwd_pallas(x, wk, interpret)


def _conv3x3_fwd(x, wk, interpret):
    return _conv_fwd_pallas(x, wk, interpret), (x, wk)


def _conv3x3_bwd(interpret, res, gy):
    x, wk = res
    cin, cout = wk.shape[0] // 9, wk.shape[1]
    dx = _conv_fwd_pallas(gy, _rot180_swap(wk, cin, cout), interpret)
    dw = _conv_wgrad_pallas(x, gy, interpret).astype(wk.dtype)
    return dx, dw


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_oracle(x: jax.Array, w: jax.Array) -> jax.Array:
    """XLA reference (identical semantics)."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
