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


class STN3d(nn.Module):
    """Spatial transformer predicting a 3x3 alignment (model.py:11-45)."""

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # x: (B, N, 3)
        dt = self.dtype
        bnr = lambda name: BatchNorm(axis_name=self.axis_name, dtype=dt,
                                     two_pass=self.precise_stats,
                                     activation="relu", name=name)

        def block(h, feats, fan_in, conv, bnn):
            y, b = _dense_fold(feats, fan_in, conv, dt)(h)
            return bnr(bnn)(y, not train, shift=b)

        h = block(x, 64, 3, "conv1", "bn1")
        h = block(h, 128, 64, "conv2", "bn2")
        h = block(h, 1024, 128, "conv3", "bn3")
        h = jnp.max(h, axis=1)                                  # (B, 1024)
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bnr = lambda name: BatchNorm(axis_name=self.axis_name,
                                     two_pass=self.precise_stats,
                                     activation="relu", name=name)

        def block(h, feats, fan_in, conv, bnn):
            y, b = _dense_fold(feats, fan_in, conv)(h)
            return bnr(bnn)(y, not train, shift=b)

        h = block(x, 64, self.k, "conv1", "bn1")
        h = block(h, 128, 64, "conv2", "bn2")
        h = block(h, 1024, 128, "conv3", "bn3")
        h = jnp.max(h, axis=1)
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        # x: (B, N, 3)
        n_pts = x.shape[1]
        dt = self.dtype
        bn = lambda name: BatchNorm(axis_name=self.axis_name, dtype=dt,
                                    two_pass=self.precise_stats, name=name)
        bnr = lambda name: BatchNorm(axis_name=self.axis_name, dtype=dt,
                                     two_pass=self.precise_stats,
                                     activation="relu", name=name)
        trans = STN3d(axis_name=self.axis_name, dtype=dt,
                      precise_stats=self.precise_stats, name="stn")(x, train)
        x = jnp.einsum("bnd,bde->bne", x.astype(jnp.float32), trans)
        y, b = _dense_fold(64, 3, "conv1", dt)(x)
        x = bnr("bn1")(y, not train, shift=b)

        if self.feature_transform:
            trans_feat = STNkd(k=64, axis_name=self.axis_name,
                               precise_stats=self.precise_stats,
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
        x = bn("bn3")(y, not train, shift=b)
        x = jnp.max(x, axis=1).astype(jnp.float32)             # (B, 1024)
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        feat, _, _ = PointNetFeat(
            axis_name=self.axis_name, dtype=self.dtype,
            precise_stats=self.precise_stats,
            name="pointnet_feat_extractor",
        )(x, train)
        return feat
