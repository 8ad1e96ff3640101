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


class STN3d(nn.Module):
    """Spatial transformer predicting a 3x3 alignment (model.py:11-45)."""

    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        # x: (B, N, 3)
        dt = self.dtype
        bn = lambda name: BatchNorm(axis_name=self.axis_name, dtype=dt,
                                    name=name)
        h = jax.nn.relu(bn("bn1")(_dense(64, 3, "conv1", dt)(x), not train))
        h = jax.nn.relu(bn("bn2")(_dense(128, 64, "conv2", dt)(h), not train))
        h = jax.nn.relu(bn("bn3")(_dense(1024, 128, "conv3", dt)(h),
                                  not train))
        h = jnp.max(h, axis=1)                                  # (B, 1024)
        h = jax.nn.relu(bn("bn4")(_dense(512, 1024, "fc1", dt)(h), not train))
        h = jax.nn.relu(bn("bn5")(_dense(256, 512, "fc2", dt)(h), not train))
        h = _dense(9, 256, "fc3", dt)(h).astype(jnp.float32)
        iden = jnp.eye(3, dtype=h.dtype).reshape(9)
        return (h + iden).reshape(-1, 3, 3)


class STNkd(nn.Module):
    """k x k feature transformer (model.py:48-84)."""

    k: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bn = lambda name: BatchNorm(axis_name=self.axis_name, name=name)
        h = jax.nn.relu(bn("bn1")(_dense(64, self.k, "conv1")(x), not train))
        h = jax.nn.relu(bn("bn2")(_dense(128, 64, "conv2")(h), not train))
        h = jax.nn.relu(bn("bn3")(_dense(1024, 128, "conv3")(h), not train))
        h = jnp.max(h, axis=1)
        h = jax.nn.relu(bn("bn4")(_dense(512, 1024, "fc1")(h), not train))
        h = jax.nn.relu(bn("bn5")(_dense(256, 512, "fc2")(h), not train))
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        # x: (B, N, 3)
        n_pts = x.shape[1]
        dt = self.dtype
        bn = lambda name: BatchNorm(axis_name=self.axis_name, dtype=dt,
                                    name=name)
        trans = STN3d(axis_name=self.axis_name, dtype=dt, name="stn")(x, train)
        x = jnp.einsum("bnd,bde->bne", x.astype(jnp.float32), trans)
        x = jax.nn.relu(bn("bn1")(_dense(64, 3, "conv1", dt)(x), not train))

        if self.feature_transform:
            trans_feat = STNkd(k=64, axis_name=self.axis_name, name="fstn")(
                x.astype(jnp.float32), train
            )
            x = jnp.einsum(
                "bnd,bde->bne", x.astype(jnp.float32), trans_feat
            ).astype(dt or x.dtype)
        else:
            trans_feat = None

        point_feat = x
        x = jax.nn.relu(bn("bn2")(_dense(128, 64, "conv2", dt)(x), not train))
        x = bn("bn3")(_dense(1024, 128, "conv3", dt)(x), not train)
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

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        feat, _, _ = PointNetFeat(
            axis_name=self.axis_name, dtype=self.dtype,
            name="pointnet_feat_extractor",
        )(x, train)
        return feat
