"""PointNet auxiliary backbones and heads (component parity, SURVEY.md §2.3).

Covers the reference modules that exist alongside the main-path encoder:

- :class:`TNet` — general k x k transformer with xavier/zero init
  (``src/pointnet/model.py:87-135``),
- :class:`PointCloudFeatureExtractor` — the 5-conv PointNet variant with
  TNet alignment (:138-196),
- :class:`PointNetCls` / :class:`PointNetDenseCls` — classification and
  per-point segmentation heads (:242-296),
- :func:`feature_transform_regularizer` — ‖I − AAᵀ‖ orthogonality penalty
  (:298-305),
- :func:`init_weights` — the pix2pix-style initializer applier from
  ``src/pointnet/network_util.py:9-39``, re-expressed as flax initializers.

None of these are used by the FPSG main path (the reference keeps them for
its standalone PointNet experiments); they are full working implementations
here for capability parity.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fpsg_tpu.nn._init import make_torch_bias_init
from fpsg_tpu.nn.normalization import BatchNorm


def _xdense(features: int, fan_in: int, name: str,
            zero_init: bool = False) -> nn.Dense:
    init = (
        nn.initializers.zeros if zero_init
        else nn.initializers.xavier_normal()
    )
    return nn.Dense(
        features, kernel_init=init,
        bias_init=make_torch_bias_init(fan_in), name=name,
    )


class TNet(nn.Module):
    """k x k alignment net; conv3 weight zero-initialized (model.py:128-135)."""

    k: int = 3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bn = lambda name: BatchNorm(axis_name=self.axis_name, name=name)
        h = jax.nn.relu(bn("bn1")(_xdense(64, self.k, "conv1")(x), not train))
        h = jax.nn.relu(bn("bn2")(_xdense(128, 64, "conv2")(h), not train))
        h = jax.nn.relu(
            bn("bn3")(_xdense(1024, 128, "conv3", zero_init=True)(h),
                      not train)
        )
        h = jnp.max(h, axis=1)
        h = jax.nn.relu(bn("bn4")(_xdense(512, 1024, "fc1")(h), not train))
        h = jax.nn.relu(bn("bn5")(_xdense(256, 512, "fc2")(h), not train))
        h = _xdense(self.k * self.k, 256, "fc3")(h)
        iden = jnp.eye(self.k, dtype=h.dtype).reshape(self.k * self.k)
        return (h + iden).reshape(-1, self.k, self.k)


class PointCloudFeatureExtractor(nn.Module):
    """5-conv PointNet variant with TNet alignment (model.py:138-196)."""

    global_feat: bool = True
    feature_transform: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        n_pts = x.shape[1]
        bn = lambda name: BatchNorm(axis_name=self.axis_name, name=name)
        trans = TNet(3, self.axis_name, name="input_tfs")(x, train)
        x = jnp.einsum("bnd,bde->bne", x, trans)
        x = jax.nn.relu(bn("bn1")(_xdense(64, 3, "conv1")(x), not train))
        x = jax.nn.relu(bn("bn2")(_xdense(64, 64, "conv2")(x), not train))

        if self.feature_transform:
            trans_feat = TNet(64, self.axis_name, name="feature_tfs")(
                x, train
            )
            x = jnp.einsum("bnd,bde->bne", x, trans_feat)
        else:
            trans_feat = None

        point_feat = x
        x = jax.nn.relu(bn("bn3")(_xdense(64, 64, "conv3")(x), not train))
        x = jax.nn.relu(bn("bn4")(_xdense(128, 64, "conv4")(x), not train))
        x = bn("bn5")(_xdense(1024, 128, "conv5")(x), not train)
        x = jnp.max(x, axis=1)
        if self.global_feat:
            return x, trans, trans_feat
        tiled = jnp.broadcast_to(
            x[:, None, :], (x.shape[0], n_pts, x.shape[1])
        )
        return jnp.concatenate([tiled, point_feat], axis=-1), trans, trans_feat


class PointNetCls(nn.Module):
    """Classification head over PointCloudFeatureExtractor (model.py:242-268).

    Returns logits (the reference's log_softmax line is commented out)."""

    k: int = 2
    feature_transform: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        feat, trans, trans_feat = PointCloudFeatureExtractor(
            global_feat=True, feature_transform=self.feature_transform,
            axis_name=self.axis_name, name="feat",
        )(x, train)
        bn = lambda name: BatchNorm(axis_name=self.axis_name, name=name)
        h = jax.nn.relu(bn("bn1")(_xdense(512, 1024, "fc1")(feat), not train))
        h = _xdense(256, 512, "fc2")(h)
        h = nn.Dropout(0.3, deterministic=not train)(h)
        h = jax.nn.relu(bn("bn2")(h, not train))
        return _xdense(self.k, 256, "fc3")(h), trans, trans_feat


class PointNetDenseCls(nn.Module):
    """Per-point segmentation head (model.py:271-296)."""

    k: int = 2
    feature_transform: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        from fpsg_tpu.nn.pointnet import PointNetFeat

        feat, trans, trans_feat = PointNetFeat(
            global_feat=False, feature_transform=self.feature_transform,
            axis_name=self.axis_name, name="feat",
        )(x, train)                                   # (B, N, 1088)
        bn = lambda name: BatchNorm(axis_name=self.axis_name, name=name)
        h = jax.nn.relu(bn("bn1")(_xdense(512, 1088, "conv1")(feat),
                                  not train))
        h = jax.nn.relu(bn("bn2")(_xdense(256, 512, "conv2")(h), not train))
        h = jax.nn.relu(bn("bn3")(_xdense(128, 256, "conv3")(h), not train))
        h = _xdense(self.k, 128, "conv4")(h)
        return jax.nn.log_softmax(h, axis=-1), trans, trans_feat


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """mean ‖A Aᵀ − I‖_F over the batch (model.py:298-305)."""
    d = trans.shape[1]
    eye = jnp.eye(d, dtype=trans.dtype)
    prod = jnp.einsum("bij,bkj->bik", trans, trans)
    return jnp.mean(
        jnp.linalg.norm((prod - eye).reshape(trans.shape[0], -1), axis=1)
    )


_INIT_GETTERS = {
    "normal": lambda gain: nn.initializers.normal(stddev=gain),
    "xavier": lambda gain: nn.initializers.xavier_normal(),
    "kaiming": lambda gain: nn.initializers.kaiming_normal(),
    "orthogonal": lambda gain: nn.initializers.orthogonal(scale=gain),
}


def init_weights(init_type: str = "normal", gain: float = 0.02):
    """pix2pix-style initializer selector (network_util.py:9-39): returns a
    flax kernel initializer to pass at module construction (the functional
    analog of the reference's in-place module walker)."""
    try:
        return _INIT_GETTERS[init_type](gain)
    except KeyError:
        raise NotImplementedError(
            f"initialization method [{init_type}] is not implemented"
        )
