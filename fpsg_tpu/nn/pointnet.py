"""PointNet encoder, TPU-native (flax.linen, channels-last).

Re-design of the reference backbone (``src/pointnet/model.py:11-45`` STN3d,
``:48-84`` STNkd, ``:199-239`` PointNetfeat) used as the class-specific
shape-prior branch via ``PCEncoder`` (``src/models/point_cloud_net.py:11-35``).

Layout: points are ``(B, N, C)`` (channels last). Every reference
``Conv1d(k=1)`` becomes a Dense on the channel axis — a pure MXU matmul —
and the ``bmm`` with the STN matrix is one more batched matmul. The whole
encoder is a single fused XLA computation; there are no kernel-launch
boundaries to hand-schedule.

Module/field names intentionally mirror the torch state-dict layout
(``stn.conv1 …``) so checkpoint ingestion (fpsg_tpu.io) is a mechanical
key mapping — the shipped ``pretrained_pcencoder_pointnet.pt`` must load
(SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fpsg_tpu.nn._init import torch_linear_kernel_init, make_torch_bias_init
from fpsg_tpu.nn.normalization import BatchNorm


def _dense(features: int, fan_in: int, name: str, dtype=None) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=make_torch_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )


class _DenseFold(nn.Module):
    """Dense whose bias is returned, not applied — it folds into the
    following BatchNorm (fpsg_tpu.nn.normalization docstring), saving a
    full elementwise pass. Params identical to ``nn.Dense``."""

    features: int
    fan_in: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array):
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (x.shape[-1], self.features))
        bias = self.param("bias", make_torch_bias_init(self.fan_in),
                          (self.features,))
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        return jnp.dot(x.astype(dt), kernel.astype(dt)), bias


def _dense_fold(features: int, fan_in: int, name: str, dtype=None):
    return _DenseFold(features, fan_in, dtype=dtype, name=name)


# test hook: force the one-pass moments kernel (interpret mode) on CPU
# so the stats-injection wiring is CI-covered (tests/test_ops_moments.py)
_FORCE_MOMENTS_KERNEL = False



def _with_point_axis(axis_name, point_axis_name):
    """BN stat axis for POINT-dim BatchNorms (inputs (B, N, F)): the
    sharded points axis is one of their reduce axes, so its mesh axis
    joins the stat psum. Post-pool (B, F) BNs must NOT get it — their
    inputs are replicated across 'sp' and psum'ing identical moments is
    harmless for the mean/var but inflates the sample count n, skewing
    the unbiased running-var correction (n/(n-1)) — caught by the x64
    exactness test."""
    if point_axis_name is None:
        return axis_name
    if axis_name is None:
        return point_axis_name
    ta = axis_name if isinstance(axis_name, tuple) else (axis_name,)
    tb = (point_axis_name if isinstance(point_axis_name, tuple)
          else (point_axis_name,))
    return ta + tuple(a for a in tb if a not in ta)


def _bn_maxpool(y, b, bn_mod, train, relu, out_dtype,
                point_axis_name=None):
    """BatchNorm(+optional relu) then global max over the points axis,
    with the per-channel affine COMMUTED through the max.

    ``point_axis_name``: mesh axis the POINT dimension is sharded over
    (parallel/sp.py) — the local max/min become ring-free ``pmax`` /
    ``pmin`` collectives before the affine selection. The caller passes
    a bn_mod whose ``axis_name`` already includes this axis
    (``_with_point_axis``): the points axis is a BN reduce axis, so the
    psum of local moments IS the global statistic.

    For a fixed channel, ``t -> k*t + b`` is monotone (k > 0) or
    antitone (k < 0), and relu/casts are monotone, so
    ``max_n act(k*y + b) == act(k*[max_n y | min_n y] + b)`` — bitwise
    equal even under bf16 rounding (a monotone per-element map commutes
    with max). The (B, N, 1024) normalized/activated tensor and its relu
    backward residual never materialize: BN computes statistics from the
    raw conv output (``return_affine=True``) and the affine applies to
    the (B, 1024) pooled values; the raw tensor's four reductions (stat
    mean/sq, max, min) fuse into one read. Saved ~1.3 ms/step across the
    three 1024-wide pool sites on the train-step trace.

    Reference semantics: ``max over points of bn(conv3(x))`` —
    pointnet/model.py:28-33 (STN3d), :63-70 (STNkd), :225-232 (feat).
    """
    from fpsg_tpu.ops.moments import moments_minmax, supports_kernel

    f = y.shape[-1]
    if train and not bn_mod.two_pass and (
            supports_kernel(y) or _FORCE_MOMENTS_KERNEL):
        # One-read Pallas reduce: BN statistics (single-read shifted
        # form) + per-batch max/min + first-index routing for the
        # backward, all from one pass over y (ops/moments.py). The BN
        # module keeps owning params/running stats via its injection
        # mode (the decoder's fused-kernel pattern).
        s = bn_mod(None, True, shift=b, return_shift=True,
                   param_shape_hint=(f,))
        zs, zq, ymax, ymin = moments_minmax(y, s)
        nr = y.shape[0] * y.shape[1]
        ax = bn_mod.axis_name
        if ax is not None:
            zs = jax.lax.psum(zs, ax)
            zq = jax.lax.psum(zq, ax)
            nr = nr * jax.lax.psum(1, ax)
        mz = zs / nr
        mean = mz + s
        var = jnp.maximum(zq / nr - mz * mz, 0.0)
        k2, b2 = bn_mod(None, False, shift=b, stats=(mean, var, nr),
                        return_affine=True)             # (F,) each
    else:
        k, beff = bn_mod(y, not train, shift=b, return_affine=True)
        k2, b2 = k[0, 0], beff[0, 0]                    # (F,)
        ymax = jnp.max(y.astype(jnp.float32), axis=1)   # (B, F)
        ymin = jnp.min(y.astype(jnp.float32), axis=1)
    if point_axis_name is not None:
        # all_gather + max rather than lax.pmax: pmax has no JAX
        # differentiation rule; the gathered (sp, B, F) stack is tiny
        # and its max routes cotangents like the local jnp.max does.
        ymax = jnp.max(jax.lax.all_gather(ymax, point_axis_name), axis=0)
        ymin = jnp.min(jax.lax.all_gather(ymin, point_axis_name), axis=0)
    od = out_dtype or y.dtype
    cd = od if od == jnp.bfloat16 else k2.dtype
    sel = jnp.where(k2 > 0, ymax, ymin).astype(cd)
    pooled = sel * k2.astype(cd) + b2.astype(cd)
    if relu:
        pooled = jnp.maximum(pooled, 0)
    return pooled.astype(od)


class STN3d(nn.Module):
    """Spatial transformer predicting a 3x3 alignment (model.py:11-45)."""

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False
    point_axis_name: Optional[str] = None  # sp mesh axis (parallel/sp.py)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # x: (B, N, 3)
        dt = self.dtype
        pax = _with_point_axis(self.axis_name, self.point_axis_name)
        mk = lambda ax: lambda name: BatchNorm(
            axis_name=ax, dtype=dt, two_pass=self.precise_stats,
            activation="relu", name=name)
        bnr_pt, bnr = mk(pax), mk(self.axis_name)

        def block(h, feats, fan_in, conv, bnn, pt=False):
            y, b = _dense_fold(feats, fan_in, conv, dt)(h)
            return (bnr_pt if pt else bnr)(bnn)(y, not train, shift=b)

        h = block(x, 64, 3, "conv1", "bn1", pt=True)
        h = block(h, 128, 64, "conv2", "bn2", pt=True)
        y, b = _dense_fold(1024, 128, "conv3", dt)(h)
        h = _bn_maxpool(y, b, bnr_pt("bn3"), train, True, dt,
                        self.point_axis_name)                   # (B, 1024)
        h = block(h, 512, 1024, "fc1", "bn4")
        h = block(h, 256, 512, "fc2", "bn5")
        h = _dense(9, 256, "fc3", dt)(h).astype(jnp.float32)
        iden = jnp.eye(3, dtype=h.dtype).reshape(9)
        return (h + iden).reshape(-1, 3, 3)


class STNkd(nn.Module):
    """k x k feature transformer (model.py:48-84)."""

    k: int = 64
    axis_name: Optional[str] = None
    precise_stats: bool = False
    point_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        pax = _with_point_axis(self.axis_name, self.point_axis_name)
        mk = lambda ax: lambda name: BatchNorm(
            axis_name=ax, two_pass=self.precise_stats,
            activation="relu", name=name)
        bnr_pt, bnr = mk(pax), mk(self.axis_name)

        def block(h, feats, fan_in, conv, bnn, pt=False):
            y, b = _dense_fold(feats, fan_in, conv)(h)
            return (bnr_pt if pt else bnr)(bnn)(y, not train, shift=b)

        h = block(x, 64, self.k, "conv1", "bn1", pt=True)
        h = block(h, 128, 64, "conv2", "bn2", pt=True)
        y, b = _dense_fold(1024, 128, "conv3")(h)
        h = _bn_maxpool(y, b, bnr_pt("bn3"), train, True, None,
                        self.point_axis_name)
        h = block(h, 512, 1024, "fc1", "bn4")
        h = block(h, 256, 512, "fc2", "bn5")
        h = _dense(self.k * self.k, 256, "fc3")(h)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(self.k * self.k)
        return (h + iden).reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """Global 1024-d PointNet feature (model.py:199-239).

    ``global_feat=False`` returns the per-point [global | point] concat for
    segmentation heads, as in the reference.
    """

    global_feat: bool = True
    feature_transform: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False
    point_axis_name: Optional[str] = None  # sp mesh axis: joined into
                                           # the point-dim BNs' stat psum
                                           # automatically

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        # x: (B, N, 3)
        n_pts = x.shape[1]
        dt = self.dtype
        pax = _with_point_axis(self.axis_name, self.point_axis_name)
        bn = lambda name: BatchNorm(axis_name=pax, dtype=dt,
                                    two_pass=self.precise_stats, name=name)
        bnr = lambda name: BatchNorm(axis_name=pax, dtype=dt,
                                     two_pass=self.precise_stats,
                                     activation="relu", name=name)
        trans = STN3d(axis_name=self.axis_name, dtype=dt,
                      precise_stats=self.precise_stats,
                      point_axis_name=self.point_axis_name,
                      name="stn")(x, train)
        x = jnp.einsum("bnd,bde->bne", x.astype(jnp.float32), trans)
        y, b = _dense_fold(64, 3, "conv1", dt)(x)
        x = bnr("bn1")(y, not train, shift=b)

        if self.feature_transform:
            trans_feat = STNkd(k=64, axis_name=self.axis_name,
                               precise_stats=self.precise_stats,
                               point_axis_name=self.point_axis_name,
                               name="fstn")(
                x.astype(jnp.float32), train
            )
            x = jnp.einsum(
                "bnd,bde->bne", x.astype(jnp.float32), trans_feat
            ).astype(dt or x.dtype)
        else:
            trans_feat = None

        point_feat = x
        y, b = _dense_fold(128, 64, "conv2", dt)(x)
        x = bnr("bn2")(y, not train, shift=b)
        y, b = _dense_fold(1024, 128, "conv3", dt)(x)
        x = _bn_maxpool(y, b, bn("bn3"), train, False, dt,
                        self.point_axis_name).astype(
            jnp.float32)                                       # (B, 1024)
        if self.global_feat:
            return x, trans, trans_feat
        tiled = jnp.broadcast_to(
            x[:, None, :], (x.shape[0], n_pts, x.shape[1])
        )
        return jnp.concatenate([tiled, point_feat], axis=-1), trans, trans_feat


class PointNetEncoder(nn.Module):
    """``PCEncoder(core='pointnet')`` equivalent: (B, N, 3) → (B, 1024).

    Mirrors PointNetWrapper (point_cloud_net.py:11-18): drops the transform
    outputs.
    """

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False
    point_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        feat, _, _ = PointNetFeat(
            axis_name=self.axis_name, dtype=self.dtype,
            precise_stats=self.precise_stats,
            point_axis_name=self.point_axis_name,
            name="pointnet_feat_extractor",
        )(x, train)
        return feat
