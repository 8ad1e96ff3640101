"""One-pass BN statistics + 2x2 max/min pool for the VGG pool sites.

Every pre-pool VGG conv layer pays three full passes over its output
beyond the conv itself: the BN statistics read, the BN affine(+relu)
write, and the maxpool read (plus three more on the backward). Because
the BN affine is per-channel monotone (k > 0) or antitone (k < 0) and
relu/casts are monotone, the affine COMMUTES through the 2x2 window
max: ``max_w relu(k*y + b) == relu(k*[max_w y | min_w y] + b)`` —
bitwise, since rounding is monotone. So this kernel computes, in ONE
read of the raw conv output: the single-read shifted BN statistics
(sum and squared-sum of ``z = y - s``) and the windowed max AND min
with first-index argument codes (torch tie rule, row-major window scan
order); the affine+relu then runs on the 4x-smaller pooled tensor. The
custom VJP is one more pass: ``gy = gzs + 2*z*gzq`` fused with the
index-routed max/min cotangents.

Window layout: inputs are WIDTH-PACKED ``(B, H, W/2, 2C)`` — the free
row-major channel-merge view of an NHWC tensor (``vgg._s2d_pack``), so
the 2x2 window is (row pair) x (channel phase) exactly like
``vgg._pool_fwd_kernel``, and the W/2 split never touches the lane
dim. Block 1's space-to-depth path is already in this layout; the
unpacked blocks take the free reshape on the way in. Statistics come
out at packed width ``2C``; the caller folds phases (both halves are
the same logical channels — `nn.normalization` ``phase_groups``
exactness argument applies verbatim).

Reference behavior covered: ``maxpool2d(relu(bn(conv(x))))`` — the
torchvision VGG16-bn feature stack (src/models/image_net.py:13-24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops._pallas_utils import (
    first_match_code, interpret_default, packed_window_elems, pool_row_tile,
)


def _fwd_kernel_factory(th: int, w2: int, c2: int):
    def kernel(y_ref, s_ref, zs_ref, zq_ref,
               ymax_ref, imax_ref, ymin_ref, imin_ref):
        bi = pl.program_id(0)
        t = pl.program_id(1)
        y = y_ref[0]                                    # (2*th, w2, c2)

        @pl.when(jnp.logical_and(bi == 0, t == 0))
        def _():
            zs_ref[0] = jnp.zeros((w2, c2), jnp.float32)
            zq_ref[0] = jnp.zeros((w2, c2), jnp.float32)

        z = y.astype(jnp.float32) - s_ref[0][None, None, :]
        zs_ref[0] += jnp.sum(z, axis=0)
        zq_ref[0] += jnp.sum(z * z, axis=0)

        # 2x2 window = (row pair) x (channel phase)
        e = packed_window_elems(y.reshape(th, 2, w2, c2), c2 // 2)
        ymax = jnp.maximum(jnp.maximum(e[0], e[1]),
                           jnp.maximum(e[2], e[3]))
        ymin = jnp.minimum(jnp.minimum(e[0], e[1]),
                           jnp.minimum(e[2], e[3]))
        ymax_ref[0] = ymax
        ymin_ref[0] = ymin
        imax_ref[0] = first_match_code(e, ymax)
        imin_ref[0] = first_match_code(e, ymin)

    return kernel


def _bwd_kernel_factory(th: int, w2: int, c2: int, out_dtype):
    c = c2 // 2

    def kernel(y_ref, a_ref, b_ref, gmax_ref, imax_ref,
               gmin_ref, imin_ref, gy_ref):
        # stat cotangent in hoisted form: gzs + 2*(y-s)*gzq == A + y*B
        # with A = gzs - 2*s*gzq, B = 2*gzq precomputed per channel —
        # 3 VPU ops/element instead of 5 over the full tensor
        y = y_ref[0].astype(jnp.float32)               # (2*th, w2, c2)
        gy = a_ref[0][None, None, :] + y * b_ref[0][None, None, :]

        gmax = gmax_ref[0].astype(jnp.float32)         # (th, w2, c)
        imax = imax_ref[0].astype(jnp.int32)
        gmin = gmin_ref[0].astype(jnp.float32)
        imin = imin_ref[0].astype(jnp.int32)
        zf = jnp.zeros((), jnp.float32)
        rows = []
        for dh in (0, 1):
            code0, code1 = 2 * dh, 2 * dh + 1
            p0 = jnp.where(imax == code0, gmax, zf) \
                + jnp.where(imin == code0, gmin, zf)
            p1 = jnp.where(imax == code1, gmax, zf) \
                + jnp.where(imin == code1, gmin, zf)
            rows.append(jnp.concatenate([p0, p1], axis=-1)[:, None])
        routed = jnp.concatenate(rows, axis=1).reshape(2 * th, w2, c2)
        gy_ref[0] = (gy + routed).astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_pallas(y, s, interpret):
    b, h, w2, c2 = y.shape
    # Scoped-VMEM estimate per tile row-pair: the double-buffered input
    # block (2*ib), the f32 z/statistics temporaries (8), and the four
    # double-buffered quarter outputs (ib+1). Validated against the one
    # measured overflow: (4,112,56,256) f32 at tile 28 hit Mosaic's
    # 16.00 MB scope exactly (estimate: 16.86M) — the f32 CLI path's
    # conv2_2 site; bf16 production shapes keep their measured tiles.
    ib = y.dtype.itemsize
    per_th = 2 * w2 * c2 * (2 * ib + 8) + 2 * w2 * c2 * (ib + 1)
    th = pool_row_tile(h // 2, row_bytes=per_th,
                       budget=14 * 1024 * 1024)
    stat = pl.BlockSpec((1, w2, c2), lambda bi, t: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    quarter = lambda dt: jax.ShapeDtypeStruct((b, h // 2, w2, c2 // 2), dt)
    qspec = pl.BlockSpec((1, th, w2, c2 // 2), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM)
    zs, zq, ymax, imax, ymin, imin = pl.pallas_call(
        _fwd_kernel_factory(th, w2, c2),
        grid=(b, (h // 2) // th),
        in_specs=[
            pl.BlockSpec((1, 2 * th, w2, c2), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda bi, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[stat, stat, qspec, qspec, qspec, qspec],
        out_shape=[
            jax.ShapeDtypeStruct((1, w2, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, w2, c2), jnp.float32),
            quarter(y.dtype), quarter(jnp.int8),
            quarter(y.dtype), quarter(jnp.int8),
        ],
        interpret=interpret,
    )(y, s.reshape(1, c2).astype(jnp.float32))
    # fold the row-resident W/2 accumulator on the way out (tiny)
    return (jnp.sum(zs[0], axis=0), jnp.sum(zq[0], axis=0),
            ymax, imax, ymin, imin)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_pallas(y, s, gzs, gzq, gmax, imax, gmin, imin, interpret):
    b, h, w2, c2 = y.shape
    # The backward holds ~5 full-block f32 temporaries (z, gy, routed
    # window cotangents, casts); budget the row tile so it fits Mosaic's
    # ~16 MB scoped-VMEM stack (see pool_row_tile).
    th = pool_row_tile(h // 2, row_bytes=2 * w2 * c2 * 4)
    stat = pl.BlockSpec((1, c2), lambda bi, t: (0, 0),
                        memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((1, th, w2, c2 // 2), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM)
    sf = s.astype(jnp.float32)
    bvec = 2.0 * gzq.astype(jnp.float32)
    avec = gzs.astype(jnp.float32) - sf * bvec
    gy = pl.pallas_call(
        _bwd_kernel_factory(th, w2, c2, y.dtype),
        grid=(b, (h // 2) // th),
        in_specs=[
            pl.BlockSpec((1, 2 * th, w2, c2), lambda bi, t: (bi, t, 0, 0),
                         memory_space=pltpu.VMEM),
            stat, stat, qspec, qspec, qspec, qspec,
        ],
        out_specs=pl.BlockSpec((1, 2 * th, w2, c2),
                               lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w2, c2), y.dtype),
        interpret=interpret,
    )(y, avec.reshape(1, c2), bvec.reshape(1, c2),
      gmax.astype(jnp.float32), imax,
      gmin.astype(jnp.float32), imin)
    return gy


@jax.custom_vjp
def pool_moments(y: jax.Array, s: jax.Array):
    """One-read reduce of a width-packed ``y (B, H, W/2, 2C)``: returns
    ``(zsum (2C,), zsq (2C,), ymax (B, H/2, W/2, C), ymin (..., C))``
    where ``z = y - s`` (``s (2C,)`` is the stop-gradient stat shift) and
    max/min pool over the 2x2 window (row pair x channel phase).

    Gradients: d zsum/dy = 1, d zsq/dy = 2z; max/min cotangents route to
    the FIRST attaining window element (torch tie semantics). ``s`` gets
    zero cotangent (stop-gradient at every call site).
    """
    zs, zq, ymax, _, ymin, _ = _fwd_pallas(y, s, interpret_default())
    return zs, zq, ymax, ymin


def _pm_fwd(y, s):
    zs, zq, ymax, imax, ymin, imin = _fwd_pallas(y, s, interpret_default())
    return (zs, zq, ymax, ymin), (y, s, imax, imin)


def _pm_bwd(res, cots):
    y, s, imax, imin = res
    gzs, gzq, gmax, gmin = cots
    gy = _bwd_pallas(y, s, gzs, gzq, gmax, imax, gmin, imin,
                     interpret_default())
    return gy, jnp.zeros_like(s)


pool_moments.defvjp(_pm_fwd, _pm_bwd)


def pool_moments_oracle(y: jax.Array, s: jax.Array):
    """jnp reference (same values; jnp tie semantics in the gradients)."""
    b, h, w2, c2 = y.shape
    z = y.astype(jnp.float32) - s[None, None, None, :]
    zs = jnp.sum(z, axis=(0, 1, 2))
    zq = jnp.sum(z * z, axis=(0, 1, 2))
    e = packed_window_elems(y.reshape(b, h // 2, 2, w2, c2), c2 // 2)
    ymax = jnp.maximum(jnp.maximum(e[0], e[1]), jnp.maximum(e[2], e[3]))
    ymin = jnp.minimum(jnp.minimum(e[0], e[1]), jnp.minimum(e[2], e[3]))
    return zs, zq, ymax, ymin


def supports_kernel(y: jax.Array) -> bool:
    """Shape gate for the Pallas path: packed width-merged layout with a
    lane-aligned packed channel dim and an even row count."""
    if y.ndim != 4:
        return False
    b, h, w2, c2 = y.shape
    return (not interpret_default()) and c2 % 128 == 0 and h % 2 == 0
