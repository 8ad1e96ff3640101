"""DGCNN (EdgeConv) point-cloud encoder, TPU-native.

Re-design of the reference DGCNN (``src/dgcnn/model.py:45-88``) with the
kNN graph built on-device by :func:`fpsg_tpu.ops.knn.knn_indices` (replacing
the CUDA ``topk`` + hardcoded-'cuda' gather at ``src/dgcnn/model.py:13-42``;
SURVEY.md §2.4 N4).

Layout: ``(B, N, C)`` channels-last. The EdgeConv gather is a single
``take_along_axis`` producing ``(B, N, k, C)`` neighbor features; each
Conv2d(k=1) is a Dense over the channel axis (MXU matmul); max-over-k and
the global max/avg pools are VPU reductions XLA fuses.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fpsg_tpu.nn._init import torch_linear_kernel_init
from fpsg_tpu.nn.normalization import BatchNorm
from fpsg_tpu.ops.knn import knn_indices


def get_graph_feature(x: jax.Array, k: int = 20) -> jax.Array:
    """EdgeConv features ``[x_j - x_i || x_i]``: (B, N, C) → (B, N, k, 2C).

    Matches reference ``get_graph_feature`` (dgcnn/model.py:23-42) with the
    flat CUDA gather replaced by a batched take.
    """
    idx = knn_indices(x, k=k)                                  # (B, N, k)
    b, n, c = x.shape
    neighbors = jnp.take_along_axis(
        x[:, :, None, :], idx[..., None], axis=1
    )                                                          # (B, N, k, C)
    center = jnp.broadcast_to(x[:, :, None, :], (b, n, k, c))
    return jnp.concatenate([neighbors - center, center], axis=-1)


class _EdgeConv(nn.Module):
    features: int
    k: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        h = get_graph_feature(x, k=self.k)
        # Reference convs are bias-free (dgcnn/model.py:53-56).
        h = nn.Dense(
            self.features,
            use_bias=False,
            kernel_init=torch_linear_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(h)
        h = BatchNorm(axis_name=self.axis_name, dtype=self.dtype,
                      two_pass=self.precise_stats, name="bn")(h, not train)
        h = jax.nn.leaky_relu(h, 0.2)
        return jnp.max(h, axis=2)                              # max over k


class DGCNNFeat(nn.Module):
    """(B, N, 3) → (B, embedding_dim) global feature (dgcnn/model.py:45-88).

    ``dual_pool=True`` (reference default): conv5 maps to emb/2 channels and
    the output concatenates global max- and avg-pools.
    """

    embedding_dim: int = 1024
    k: int = 20
    dual_pool: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        emb = self.embedding_dim // 2 if self.dual_pool else self.embedding_dim
        dt = self.dtype
        x1 = _EdgeConv(64, self.k, self.axis_name, dt,
                       precise_stats=self.precise_stats, name="conv1")(x, train)
        x2 = _EdgeConv(64, self.k, self.axis_name, dt,
                       precise_stats=self.precise_stats, name="conv2")(x1, train)
        x3 = _EdgeConv(128, self.k, self.axis_name, dt,
                       precise_stats=self.precise_stats, name="conv3")(x2, train)
        x4 = _EdgeConv(256, self.k, self.axis_name, dt,
                       precise_stats=self.precise_stats, name="conv4")(x3, train)
        h = jnp.concatenate([x1, x2, x3, x4], axis=-1)         # (B, N, 512)
        h = nn.Dense(
            emb,
            use_bias=False,
            kernel_init=torch_linear_kernel_init,
            dtype=dt,
            name="conv5",
        )(h)
        h = BatchNorm(axis_name=self.axis_name, dtype=dt,
                      two_pass=self.precise_stats, name="bn5")(h, not train)
        h = jax.nn.leaky_relu(h, 0.2).astype(jnp.float32)
        mx = jnp.max(h, axis=1)
        if not self.dual_pool:
            return mx
        av = jnp.mean(h, axis=1)
        return jnp.concatenate([mx, av], axis=-1)
