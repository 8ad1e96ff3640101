"""Image branch: VGG16-bn encoder, TPU-native.

Re-design of ``ImageEncoderWarpper`` (reference ``src/models/image_net.py:
6-39``): torchvision VGG16-bn ``.features`` + AdaptiveAvgPool2d(1,1),
yielding a 512-d image embedding from a 224x224x3 input.

Layout: NHWC (TPU-native conv layout). Convs run in bf16-friendly shapes on
the MXU; BN follows torch semantics (:mod:`fpsg_tpu.nn.normalization`).

ImageNet-pretrained weights: the reference downloads them from torchvision
at runtime (``image_net.py:14``). This framework ships a converter
(:mod:`fpsg_tpu.io.convert`) that ingests a torchvision ``vgg16_bn``
state-dict file when one is provided (``--img_encoder_path``); with no
checkpoint the encoder trains from torch-default random init.

Note reference quirk (SURVEY.md §5.1 item 7): ``_set_finetune`` is never
called, so the whole VGG finetunes. We reproduce that default and make the
freeze actually work when ``finetune_layer >= 0`` is requested (the fixed
behavior is opt-in via the optimizer mask in fpsg_tpu.train).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.nn.activations import relu
from fpsg_tpu.nn.normalization import BatchNorm, _affine_relu
from fpsg_tpu.ops._pallas_utils import interpret_default

# torchvision cfg 'D' (vgg16): conv widths with 'M' maxpools.
VGG16_CFG: Sequence[Union[int, str]] = (
    64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
    512, 512, 512, "M", 512, 512, 512, "M",
)

# ---------------------------------------------------------------------------
# Space-to-depth execution of conv block 1 (the 64-channel 224^2 layers)
# ---------------------------------------------------------------------------
#
# The 64-channel layers cannot fill the MXU's 128 lanes and measure
# 28 TF/s (r3 trace: 9.0 ms for the four 224^2 conv passes, plus a 4.8 TF/s
# 3->64 wgrad and ~3 ms of 224^2 maxpool/elementwise). Packing width pairs
# into channels (B,224,224,C) -> (B,224,112,2C) turns both block-1 convs
# into 128-lane convs (6->128, 128->128): 2x the FLOPs (the packed kernel
# is half structurally zero) at full-lane MXU rates (~110-150 TF/s for
# 128-ch shapes) — a large net win for forward, dgrad AND wgrad. (The
# full 2x2 packing was measured too: its 256-wide convs hit ~145 TF/s but
# the 4x FLOP inflation on conv1_2's fwd/dgrad/wgrad gave most of the win
# back; 1x2 keeps lanes full at half the inflation.) The 2x2/2 maxpool
# that closes the block becomes a row-pair + phase max with no 224-wide
# layout pass.
#
# Exactness: for output column phase dw and column tap v of the original
# 3x3 kernel, input column 2j+dw+v-1 lives at packed column
# a = (dw+v-1)//2 + 1 with phase q = (dw+v-1) % 2: scattering
# W[u, v, c, f] to Wp[u, a, (q,c), (dw,f)] makes the packed conv compute
# literally the same sums (rows are untouched). Taps that would read
# outside the original padded image land on packed positions whose weight
# is zero, so SAME padding is preserved. _S2D_TAP is that (a, q, dw, v)
# incidence tensor; the kernel transform is one tiny einsum per step with
# gradients flowing through it (wgrad happens in packed space, 128-lane).

_S2D_TAP = np.zeros((3, 2, 2, 3), np.float32)  # [a, phase, d, v]
for _a in range(3):
    for _p in range(2):
        for _d in range(2):
            _u = 2 * _a + _p - _d - 1
            if 0 <= _u < 3:
                _S2D_TAP[_a, _p, _d, _u] = 1.0


def _s2d_pack(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, W/2, 2C), channel order (dw, c) — an
    adjacent-dims merge, no transpose."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def _s2d_kernel(w: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (3, 3, 2Ci, 2Co) packed-space equivalent kernel."""
    tap = jnp.asarray(_S2D_TAP, w.dtype)
    wp = jnp.einsum("aqdv,uvcf->uaqcdf", tap, w)
    ci, co = w.shape[2], w.shape[3]
    return wp.reshape(3, 3, 2 * ci, 2 * co)


def _packed_pool_slices(x):
    """The four 2x2-window elements of a width-packed (B, H, W/2, 2C)
    tensor, in torch's row-major (dh, dw) window scan order: dh = the row
    pair, dw = the channel phase. (A two-stage phase-then-row pool was
    measured slower: its full-row-resolution intermediate costs ~4 ms of
    extra HBM traffic vs ~2.7 ms of layout passes here.)"""
    from fpsg_tpu.ops._pallas_utils import packed_window_elems

    b, h, w2, c2 = x.shape
    return packed_window_elems(x.reshape(b, h // 2, 2, w2, c2), c2 // 2)


# --- Pallas packed-pool kernels (TPU): the XLA lowering of the 5-D view
# above materializes ~2.7 ms/step of layout-conversion passes (r3 step
# trace, vgg.py pool rows); in-kernel the row split/merge is free.

def _pool_fwd_kernel(x_ref, y_ref, idx_ref):
    from fpsg_tpu.ops._pallas_utils import (
        first_match_code, packed_window_elems,
    )

    h, w2, c2 = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    e = packed_window_elems(x_ref[0].reshape(h // 2, 2, w2, c2), c2 // 2)
    y = jnp.maximum(jnp.maximum(e[0], e[1]), jnp.maximum(e[2], e[3]))
    y_ref[0] = y
    idx_ref[0] = first_match_code(e, y)


def _pool_bwd_kernel(idx_ref, g_ref, gx_ref):
    idx = idx_ref[0].astype(jnp.int32)
    g = g_ref[0]
    z = jnp.zeros((), g.dtype)
    rows = []
    for dh in (0, 1):
        phases = [jnp.where(idx == (2 * dh + dw), g, z)
                  for dw in (0, 1)]
        rows.append(jnp.concatenate(phases, axis=-1)[:, None])
    h2, w2, c2 = rows[0].shape[0], rows[0].shape[2], rows[0].shape[3]
    gx_ref[0] = jnp.concatenate(rows, axis=1).reshape(2 * h2, w2, c2)


def _pool_row_tile(h2: int, w2: int = 0, c2: int = 0,
                   itemsize: int = 0, bwd: bool = False) -> int:
    """Byte-budgeted row tile (see ops/_pallas_utils.pool_row_tile and
    the measured-overflow note in ops/pool_moments._fwd_pallas): the
    fwd kernel holds the double-buffered input block, the f32
    first-match compares, and the double-buffered y/idx outputs; the
    bwd holds idx/g inputs, the phase-concat temporaries and the
    double-width output."""
    from fpsg_tpu.ops._pallas_utils import pool_row_tile

    if not w2:
        return pool_row_tile(h2)
    if bwd:  # (w2, c2=channel count of g here) per tile row
        per_th = w2 * c2 * (2 + 14 * itemsize)
    else:
        per_th = w2 * c2 * (6 * itemsize + 11)
    return pool_row_tile(h2, row_bytes=per_th, budget=14 * 1024 * 1024)


def _pool_pallas_fwd(x):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fpsg_tpu.ops._pallas_utils import interpret_default

    b, h, w2, c2 = x.shape
    th = _pool_row_tile(h // 2, w2, c2, x.dtype.itemsize)
    return pl.pallas_call(
        _pool_fwd_kernel,
        grid=(b, (h // 2) // th),
        in_specs=[pl.BlockSpec((1, 2 * th, w2, c2),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, th, w2, c2 // 2),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w2, c2 // 2),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h // 2, w2, c2 // 2), x.dtype),
            jax.ShapeDtypeStruct((b, h // 2, w2, c2 // 2), jnp.int8),
        ],
        interpret=interpret_default(),
    )(x)


def _pool_pallas_bwd(idx, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from fpsg_tpu.ops._pallas_utils import interpret_default

    b, h2, w2, c = g.shape
    th = _pool_row_tile(h2, w2, c, g.dtype.itemsize, bwd=True)
    return pl.pallas_call(
        _pool_bwd_kernel,
        grid=(b, h2 // th),
        in_specs=[
            pl.BlockSpec((1, th, w2, c), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w2, c), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, w2, 2 * c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * h2, w2, 2 * c), g.dtype),
        interpret=interpret_default(),
    )(idx, g)


@jax.custom_vjp
def _phase_max(x: jax.Array) -> jax.Array:
    """2x2/2 maxpool of the width-packed layout: (B, H, W/2, 2C) ->
    (B, H/2, W/2, C). Window order matches ``_maxpool_2x2`` (torch's
    FIRST-maximal tie rule routes identically). Pallas kernels on TPU
    (the XLA 5-D-view lowering costs layout passes); sliced jnp
    elsewhere."""
    if jax.default_backend() == "tpu":
        return _pool_pallas_fwd(x)[0]
    e = _packed_pool_slices(x)
    return jnp.maximum(jnp.maximum(e[0], e[1]), jnp.maximum(e[2], e[3]))


def _phase_max_fwd(x):
    if jax.default_backend() == "tpu":
        y, idx = _pool_pallas_fwd(x)
        return y, idx
    from fpsg_tpu.ops._pallas_utils import first_match_code

    e = _packed_pool_slices(x)
    y = jnp.maximum(jnp.maximum(e[0], e[1]), jnp.maximum(e[2], e[3]))
    return y, first_match_code(e, y)


def _phase_max_bwd(idx, g):
    if jax.default_backend() == "tpu":
        return (_pool_pallas_bwd(idx, g),)
    b, h2, w2, c = g.shape
    rows = []
    for dh in (0, 1):
        phases = [
            jnp.where(idx == jnp.int8(2 * dh + dw), g, jnp.zeros((), g.dtype))
            for dw in (0, 1)
        ]
        rows.append(jnp.concatenate(phases, axis=-1))
    gx = jnp.stack(rows, axis=2)                   # (B, H/2, 2, W/2, 2C)
    return (gx.reshape(b, 2 * h2, w2, 2 * c),)


_phase_max.defvjp(_phase_max_fwd, _phase_max_bwd)


# test hook: force the one-pass pool-moments kernel (interpret mode) on
# CPU so the fused BN→pool wiring is CI-covered (tests/test_pool_moments.py)
_FORCE_POOL_KERNEL = False
_FORCE_CONV_KERNEL = False  # tests: run the fused conv+BN chain in
                            # interpret mode off-TPU
# Feature indices whose conv site runs the tensor path instead of the
# fused Pallas conv chain. Default = every 256/512-channel site, from the
# TPU conv probe (BASELINE.md round-3c measurement, benchmarks/conv_probe
# --bwd): at (56,56,256,256) the combined backward collapses to 23 TF/s
# (21.2 ms vs XLA's 4.5) and even split dgrad+wgrad (6.75 ms) loses to
# the XLA VJP + separate BN passes; at the 512 blocks (28^2/14^2) the
# split backward is 1.7-1.9x XLA's. The chain stays on where it wins:
# the packed block-1 convs and the 128-ch 112^2 block (site idx 7, 10),
# whose conv+BN fusion beats XLA-conv + separate BN passes on both
# passes. Indices: conv3_x = 14/17/20, conv4_x = 24/27/30,
# conv5_x = 34/37/40 (torchvision vgg16_bn features numbering).
_FC_SKIP = frozenset({14, 17, 20, 24, 27, 30, 34, 37, 40})
# Feature indices whose conv runs Winograd F(2,3) (ops/winograd.py) when
# the model's ``winograd`` flag is on: 4/9 of the direct conv's MACs in
# fwd/dgrad/wgrad at the cost of 4x-input transformed activations in HBM.
# Default = every unpacked conv site; trim per the TPU probe
# (benchmarks/winograd_probe.py) the way _FC_SKIP gates the fused chain.
_WG_SITES = frozenset({7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40})


def _inject_conv_stats(bn_mod, s_c, zs, zq, n, fold, phases: int = 1):
    """Fold the fused conv's epilogue statistics into the BN module
    (stats-injection mode, exactly like _bn_pool_fused): phase-fold,
    cross-replica psum, shifted mean/var, running-stat update; returns
    the collapsed per-channel affine (k, b) f32 at LOGICAL width."""
    if phases > 1:
        c = zs.shape[0] // phases
        zs = sum(zs[i * c:(i + 1) * c] for i in range(phases))
        zq = sum(zq[i * c:(i + 1) * c] for i in range(phases))
        n = n * phases
    ax = bn_mod.axis_name
    if ax is not None:
        zs = jax.lax.psum(zs, ax)
        zq = jax.lax.psum(zq, ax)
        n = n * jax.lax.psum(1, ax)
    mz = zs / n
    mean = mz + s_c
    var = jnp.maximum(zq / n - mz * mz, 0.0)
    return bn_mod(None, False, shift=fold, stats=(mean, var, n),
                  return_affine=True)


def _bn_pool_fused(y, fold, bn_mod, out_dtype):
    """BatchNorm(+relu) then 2x2 maxpool with the per-channel affine
    COMMUTED through the pool, on a width-packed conv output
    ``(B, H, W/2, 2C)`` (``vgg._s2d_pack`` view — free for unpacked NHWC,
    the native layout for the space-to-depth block 1).

    ``max_w relu(k*y + b) == relu(k*[max_w y | min_w y] + b)`` per
    channel (monotone affine for k > 0, antitone for k < 0; relu/casts
    monotone — bitwise equal even under bf16 rounding). The normalized/
    activated full-size tensor and its relu backward residual never
    materialize: one Pallas read of the raw conv output yields the
    single-read BN statistics AND the windowed max/min with first-index
    routing (ops/pool_moments.py); the affine+relu runs on the 4x-smaller
    pooled values. The BN module keeps owning params/running stats via
    its stats-injection mode. Only valid in train mode with single-read
    stats (callers fall back to the tensor path otherwise).

    Reference semantics: ``maxpool2d(relu(bn(conv(x))))`` — the
    torchvision VGG16-bn feature stack (src/models/image_net.py:13-24).
    """
    from fpsg_tpu.ops.pool_moments import pool_moments

    c2 = y.shape[-1]
    c = c2 // 2
    s_c = bn_mod(None, True, shift=fold, return_shift=True,
                 param_shape_hint=(c,))
    zs, zq, ymax, ymin = pool_moments(y, jnp.tile(s_c, 2))
    # fold the two width phases (same logical channels — the
    # normalization.phase_groups exactness argument applies verbatim)
    zs = zs[:c] + zs[c:]
    zq = zq[:c] + zq[c:]
    n = y.shape[0] * y.shape[1] * y.shape[2] * 2
    ax = bn_mod.axis_name
    if ax is not None:
        zs = jax.lax.psum(zs, ax)
        zq = jax.lax.psum(zq, ax)
        n = n * jax.lax.psum(1, ax)
    mz = zs / n
    mean = mz + s_c
    var = jnp.maximum(zq / n - mz * mz, 0.0)
    k2, b2 = bn_mod(None, False, shift=fold, stats=(mean, var, n),
                    return_affine=True)                  # (C,) f32
    od = out_dtype or y.dtype
    cd = od if od == jnp.bfloat16 else k2.dtype
    sel = jnp.where(k2 > 0, ymax.astype(cd), ymin.astype(cd))
    pooled = jnp.maximum(sel * k2.astype(cd) + b2.astype(cd), 0)
    return pooled.astype(od)


def _conv_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = shape[0] * shape[1] * shape[2]  # kh * kw * in_ch (HWIO)
    bound = (1.0 / fan_in) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _ConvFold(nn.Module):
    """3x3 same-padding conv whose bias is returned, NOT applied — it folds
    into the following BatchNorm (see fpsg_tpu.nn.normalization docstring),
    saving one full read+write pass over the activation per layer. Param
    names/shapes/inits are identical to ``nn.Conv`` so checkpoint maps and
    golden tests are unchanged."""

    features: int
    dtype: Optional[jnp.dtype] = None
    winograd: bool = False   # Winograd F(2,3) instead of the direct conv
                             # (same math, 4/9 the MACs, LSB-level rounding
                             # differences — ops/winograd.py)

    @nn.compact
    def __call__(self, x: jax.Array, return_params: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", _conv_init,
                            (3, 3, in_ch, self.features))
        bound = (1.0 / (9 * in_ch)) ** 0.5
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (self.features,),
        )
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        if return_params:
            # fused-conv orchestration happens at VGG scope (a flax
            # module cannot call its parent's sibling BN from here)
            return kernel, bias, dt
        if (self.winograd and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0):
            from fpsg_tpu.ops.winograd import winograd_conv3x3

            return winograd_conv3x3(x.astype(dt), kernel.astype(dt)), bias
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y, bias


class _ConvFoldS2D(nn.Module):
    """``_ConvFold`` executed in width-packed space: parameters
    (names/shapes/inits) are identical to ``_ConvFold`` with ``logical_in``
    input channels, but the input/output are packed ``(B, H, W/2, 2C)``
    tensors and the conv runs with the ``_s2d_kernel``-transformed weights
    (module comment above). Bias is returned for BN folding, per original
    output channel (the 2 phase copies share it)."""

    features: int
    logical_in: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xp: jax.Array, return_params: bool = False):
        kernel = self.param("kernel", _conv_init,
                            (3, 3, self.logical_in, self.features))
        bound = (1.0 / (9 * self.logical_in)) ** 0.5
        bias = self.param(
            "bias",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (self.features,),
        )
        dt = self.dtype or jnp.promote_types(xp.dtype, kernel.dtype)
        if return_params:
            return kernel, bias, dt
        y = jax.lax.conv_general_dilated(
            xp.astype(dt), _s2d_kernel(kernel).astype(dt),
            (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y, bias


def _window_slices(x):
    """The four 2x2-window elements as quarter-size slices, in torch's
    row-major scan order (dh, dw)."""
    b, h, w, c = x.shape
    x6 = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return [x6[:, :, i, :, j, :] for i in (0, 1) for j in (0, 1)]


@jax.custom_vjp
def _maxpool_2x2(x: jax.Array) -> jax.Array:
    """2x2/2 max pool. Identical forward to ``nn.max_pool``; the custom
    backward routes the cotangent by a 2-bit argmax saved at forward time
    (torch's tie rule: FIRST maximal element in row-major window order) —
    one fused pass over g+idx, never re-reading x, vs XLA's slow
    select-and-scatter (2.5 ms/step) or eq-mask recompute (7.5 ms/step,
    both measured on the step trace). Requires even H/W (torch's floor
    behavior on odd dims is not reproduced — the VGG path is always
    even-sized from a 224 input)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (
        f"_maxpool_2x2 requires even spatial dims, got ({h}, {w}); use "
        f"nn.max_pool for odd sizes"
    )
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def _maxpool_2x2_fwd(x):
    from fpsg_tpu.ops._pallas_utils import first_match_code

    e = _window_slices(x)
    y = jnp.maximum(jnp.maximum(e[0], e[1]), jnp.maximum(e[2], e[3]))
    return y, first_match_code(e, y)


def _maxpool_2x2_bwd(idx, g):
    # One fused elementwise pass: broadcast idx/g onto the windowed 6-d
    # view and compare against the window-position code 2*dh+dw. No
    # concatenates (a quad-stack formulation materializes a concat tree —
    # measured 7 ms/step); the (b,h2,2,w2,2,c)->(b,h,w,c) reshape is
    # contiguity-preserving.
    b, h2, w2, c = idx.shape
    idx6 = idx[:, :, None, :, None, :]
    g6 = g[:, :, None, :, None, :]
    dh = jax.lax.broadcasted_iota(jnp.int8, (1, 1, 2, 1, 1, 1), 2)
    dw = jax.lax.broadcasted_iota(jnp.int8, (1, 1, 1, 1, 2, 1), 4)
    pos = 2 * dh + dw
    gx6 = jnp.where(
        idx6 == pos,
        jnp.broadcast_to(g6, (b, h2, 2, w2, 2, c)),
        jnp.zeros((), g.dtype),
    )
    return (gx6.reshape(b, 2 * h2, 2 * w2, c),)


_maxpool_2x2.defvjp(_maxpool_2x2_fwd, _maxpool_2x2_bwd)


class VGG16BN(nn.Module):
    """VGG16-bn feature extractor: (B, 224, 224, 3) → (B, 512).

    Layer names carry the torchvision ``features.<i>`` index so checkpoint
    conversion is a direct key map.
    """

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False  # two-pass BN variance everywhere (exact
                                 # torch-trajectory parity; ~5% slower)
    s2d_block1: bool = True      # run the 64-channel block in
                                 # space-to-depth packed space (identical
                                 # math at full-lane MXU rates; see the
                                 # module comment at _S2D_TAP)
    fused_conv: bool = False     # run the conv+BN chain through the
                                 # fused Pallas conv kernels in train
                                 # mode (ops/conv3x3.py): the previous
                                 # BN's affine+relu in the conv prologue,
                                 # output statistics in its epilogue —
                                 # the normalized tensors and statistics
                                 # read passes never materialize
    winograd: bool = False       # Winograd F(2,3) for the unpacked conv
                                 # sites in _WG_SITES (ops/winograd.py):
                                 # 4/9 the MACs in fwd/dgrad/wgrad, LSB
                                 # rounding differences only; probe-gated
                                 # like fused_conv
    stage_slice: Optional[tuple] = None
                                 # (lo, hi) over VGG16_CFG: apply only
                                 # that cfg range — the pipeline-
                                 # parallel stage split (parallel/pp.py,
                                 # tests/test_pp_flagship.py). Layer
                                 # names keep their GLOBAL torchvision
                                 # indices, so a stage's param tree is
                                 # literally the full model's params
                                 # filtered to its range. The avgpool
                                 # head runs only when hi == len(cfg);
                                 # other stages return the NHWC
                                 # activation (the pp boundary tensor).

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        lo, hi = self.stage_slice or (0, len(VGG16_CFG))
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def bn(idx):
            return BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                             two_pass=self.precise_stats, activation="relu",
                             name=f"features_{idx}")

        from fpsg_tpu.ops.conv3x3 import conv_bn_fused
        from fpsg_tpu.ops.pool_moments import supports_kernel

        def fused_ok(y):
            # Pre-pool BN sites commute the affine through the pool and
            # take the one-read stats+max/min kernel (train-mode
            # single-read stats only; the tensor path is the fallback).
            return train and not self.precise_stats and (
                supports_kernel(y) or _FORCE_POOL_KERNEL)

        # Fused-conv chain gate (same conditions as the pool kernels;
        # per-site h must be even for the kernel's 2-row halo refs).
        use_fc = (train and not self.precise_stats and self.fused_conv
                  and (not interpret_default() or _FORCE_CONV_KERNEL))
        interp = interpret_default()

        def mat(pending):
            # materialize a raw conv output whose affine+relu was meant
            # for the next conv's prologue (fallback sites only)
            y, k2, b2 = pending
            return _affine_relu(
                y, k2[None, None, None, :], b2[None, None, None, :]
            ).astype(y.dtype)

        idx = sum(1 if e == "M" else 3 for e in VGG16_CFG[:lo])
        cfg = VGG16_CFG[lo:hi]
        if (lo == 0 and hi > 2 and self.s2d_block1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            # Block 1 (conv 3->64, conv 64->64, maxpool) width-packed: BN
            # runs at packed width with ``phase_groups=2`` (stats folded
            # across the 2 phase copies on the small side — the same
            # element set as the unpacked 224^2 BN, param/stat shapes
            # unchanged); the closing maxpool is the row-pair + phase max
            # (fused with conv1_2's BN when the kernel path is on).
            xp = _s2d_pack(x)
            conv11 = _ConvFoldS2D(64, logical_in=3, dtype=self.dtype,
                                  name="features_0")
            bn11 = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                             two_pass=self.precise_stats,
                             activation="relu", phase_groups=2,
                             name="features_1")
            conv12 = _ConvFoldS2D(64, logical_in=64, dtype=self.dtype,
                                  name="features_3")
            bn1 = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                            two_pass=self.precise_stats,
                            activation="relu", phase_groups=2,
                            name="features_4")
            y, fold = conv11(xp)   # XLA conv: cin=6 is lane-starved in
                                   # Pallas; its epilogue would not pay
            if use_fc and y.shape[1] % 2 == 0:
                # stats-only single read of y (XLA fuses sub/sq/reduce
                # into one pass — the separate affine write+read of the
                # 417 MB features_1 tensor is what disappears here); the
                # affine+relu fuses into conv1_2's Pallas prologue.
                s_c = bn11(None, True, shift=fold, return_shift=True,
                           param_shape_hint=(64,))
                z = y.astype(jnp.float32) - jnp.tile(s_c, 2)
                zs = jnp.sum(z, axis=(0, 1, 2))
                zq = jnp.sum(z * z, axis=(0, 1, 2))
                n = y.shape[0] * y.shape[1] * y.shape[2]
                k1, b1 = _inject_conv_stats(bn11, s_c, zs, zq, n, fold,
                                            phases=2)
                kern2, fold2, dt2 = conv12(y, return_params=True)
                wk2 = _s2d_kernel(kern2).astype(dt2).reshape(9 * 128, 128)
                y2, _, _ = conv_bn_fused(
                    y.astype(dt2), jnp.tile(k1, 2), jnp.tile(b1, 2), wk2,
                    jnp.zeros((128,), jnp.float32), True, False, interp)
                if fused_ok(y2):
                    x = _bn_pool_fused(y2, fold2, bn1, self.dtype)
                else:
                    x = _phase_max(bn1(y2, not train, shift=fold2))
            else:
                xp = bn11(y, not train, shift=fold)
                y, fold = conv12(xp)
                if fused_ok(y):
                    x = _bn_pool_fused(y, fold, bn1, self.dtype)
                else:
                    x = _phase_max(bn1(y, not train, shift=fold))
            idx = 7  # past conv1_1(0..2), conv1_2(3..5), pool(6)
            cfg = VGG16_CFG[3:hi]
        j = 0
        pending = None   # raw conv output + its BN affine, awaiting
                         # fusion into the next conv's prologue
        while j < len(cfg):
            v = cfg[j]
            if v == "M":
                if pending is not None:
                    x, pending = mat(pending), None
                x = _maxpool_2x2(x)
                idx += 1
                j += 1
                continue
            v = int(v)
            conv = _ConvFold(v, dtype=self.dtype,
                             winograd=self.winograd and idx in _WG_SITES,
                             name=f"features_{idx}")
            bn_mod = bn(idx + 1)
            pre_pool = j + 1 < len(cfg) and cfg[j + 1] == "M"
            h_in = (pending[0] if pending is not None else x).shape[1]
            if not (use_fc and h_in % 2 == 0 and idx not in _FC_SKIP):
                if pending is not None:
                    x, pending = mat(pending), None
                y, b = conv(x)
                if pre_pool:
                    yp = _s2d_pack(y)  # free width-merge view
                    if fused_ok(yp):
                        x = _bn_pool_fused(yp, b, bn_mod, self.dtype)
                        idx += 4  # conv, bn, relu, pool
                        j += 2
                        continue
                x = bn_mod(y, not train, shift=b)
                idx += 3  # conv, bn, relu
                j += 1
                continue
            # ---- fused conv site ----------------------------------------
            if pending is None:
                xin, has_pro = x, False
                kz = bz = None
            else:
                (xin, kz, bz), has_pro = pending, True
                pending = None
            kern, fold, dt = conv(xin, return_params=True)
            cin = kern.shape[2]
            wk = kern.astype(dt).reshape(9 * cin, v)
            if kz is None:
                kz = jnp.zeros((cin,), jnp.float32)
                bz = jnp.zeros((cin,), jnp.float32)
            if pre_pool:
                y, _, _ = conv_bn_fused(
                    xin.astype(dt), kz, bz, wk,
                    jnp.zeros((v,), jnp.float32), has_pro, False, interp)
                yp = _s2d_pack(y)
                if fused_ok(yp):
                    x = _bn_pool_fused(yp, fold, bn_mod, self.dtype)
                    idx += 4
                    j += 2
                    continue
                x = bn_mod(y, not train, shift=fold)
                idx += 3
                j += 1
                continue
            s_c = bn_mod(None, True, shift=fold, return_shift=True,
                         param_shape_hint=(v,))
            y, zs, zq = conv_bn_fused(xin.astype(dt), kz, bz, wk, s_c,
                                      has_pro, True, interp)
            n = y.shape[0] * y.shape[1] * y.shape[2]
            k2, b2 = _inject_conv_stats(bn_mod, s_c, zs, zq, n, fold)
            pending = (y, k2, b2)
            idx += 3
            j += 1
        if pending is not None:
            x, pending = mat(pending), None
        if hi < len(VGG16_CFG):
            return x  # pp stage boundary: the raw NHWC activation
        # AdaptiveAvgPool2d((1,1)) == global mean over H, W.
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


class TinyImageEncoder(nn.Module):
    """Small conv stub behind the same 512-d interface (for tests/CI and the
    minimum end-to-end slice, SURVEY.md §7)."""

    features: int = 512
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i, ch in enumerate((32, 64, 128)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), name=f"conv{i}")(x)
            x = BatchNorm(axis_name=self.axis_name, name=f"bn{i}")(x, not train)
            x = relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.features, name="proj")(x)


class ImageEncoder(nn.Module):
    """``ImageEncoderWarpper`` equivalent (image_net.py:6-24): backbone
    selector behind a fixed 512-d interface."""

    backbone: str = "vgg_16"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False
    fused_conv: bool = False
    winograd: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.backbone == "vgg_16":
            return VGG16BN(axis_name=self.axis_name, dtype=self.dtype,
                           precise_stats=self.precise_stats,
                           fused_conv=self.fused_conv,
                           winograd=self.winograd,
                           name="encoder")(x, train)
        if self.backbone == "tiny":
            return TinyImageEncoder(axis_name=self.axis_name, name="encoder")(
                x, train
            )
        raise NotImplementedError(
            f"Unsupported image encoder backbone: {self.backbone}"
        )
