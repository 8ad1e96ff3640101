"""DGCNN (EdgeConv) point-cloud encoder, TPU-native.

Re-design of the reference DGCNN (``src/dgcnn/model.py:45-88``) with the
kNN graph built on-device by :func:`fpsg_tpu.ops.knn.knn_indices` (replacing
the CUDA ``topk`` + hardcoded-'cuda' gather at ``src/dgcnn/model.py:13-42``;
SURVEY.md §2.4 N4).

EdgeConv executes in decomposed form (round 3; the direct translation —
gather -> concat -> Conv2d -> BN -> LeakyReLU -> max — materialized a
(B, N, k, 2C) edge tensor AND its (B, N, k, F) conv output in HBM and
re-multiplied the conv weights once per neighbor):

    e_ij = [x_j - x_i || x_i] @ W  =  Z_j + U_i,
    Z = x @ W_a,  U = x @ (W_b - W_a)        (W = [W_a; W_b], bias-free)

so the conv runs ONCE per point (k x fewer FLOPs), the gather moves onto
``Z``, and the (B,N,k,*) tensors shrink to one gathered Z. The
max-over-neighbors then commutes through BN + LeakyReLU:

    max_j LeakyReLU(k*(Z_j + U_i) + b)
      = LeakyReLU(k * extreme_i + (k*U_i + b)),
    extreme_i[f] = max_j Z_j[f] if k[f] > 0 else min_j Z_j[f]

(LeakyReLU is strictly increasing; the per-channel BN scale's sign picks
which extreme). Batch statistics of the full (B, N, k, F) edge-feature
population are recovered EXACTLY from neighbor sums:

    sum_ij e = sum_i sumZ_i + k * sum_i U_i
    sum_ij (e - s)^2 = sum_i [sumZsq_i + 2 t_i sumZ_i + k t_i^2],
    t_i = U_i - s

with sumZ/sumZsq reduced over the gathered neighbors — the edge tensor
itself never exists. BatchNorm runs in stats-injection mode
(:class:`fpsg_tpu.nn.normalization.BatchNorm`), still owning
params/running stats under the same ``bn`` name.

Layout: ``(B, N, C)`` channels-last; each matmul maps to the MXU.
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
    flat CUDA gather replaced by a batched take. Kept as the reference-
    parity building block (and oracle for the decomposed EdgeConv below);
    the encoder's hot path no longer materializes this tensor.
    """
    idx = knn_indices(x, k=k)                                  # (B, N, k)
    b, n, c = x.shape
    neighbors = jnp.take_along_axis(
        x[:, :, None, :], idx[..., None], axis=1
    )                                                          # (B, N, k, C)
    center = jnp.broadcast_to(x[:, :, None, :], (b, n, k, c))
    return jnp.concatenate([neighbors - center, center], axis=-1)


class _EdgeConvKernel(nn.Module):
    """Owns the (2C, F) conv kernel under the same param path as the
    previous ``nn.Dense(name='conv')`` (checkpoint/golden compatibility)."""

    d_in: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", torch_linear_kernel_init, (self.d_in, self.features)
        )


class _EdgeConv(nn.Module):
    features: int
    k: int
    axis_name: Optional[str] = None
    point_axis_name: Optional[str] = None  # 'sp' mesh axis the POINT
                                           # dim is sharded over: the
                                           # kNN graph crosses shard
                                           # boundaries, so aggregates
                                           # run the two-pass ring
                                           # (parallel/sp.py:
                                           # ring_knn_aggregate) and
                                           # the BN stat psums join sp
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, n, c = x.shape
        f = self.features
        dt = self.dtype or x.dtype
        # Reference convs are bias-free (dgcnn/model.py:53-56).
        w = _EdgeConvKernel(2 * c, f, name="conv")()
        # one matmul for both halves: [Z || U] = x @ [W_a ; W_b - W_a]
        wz = jnp.concatenate(
            [w[:c], w[c:] - w[:c]], axis=-1
        ).astype(dt)                                           # (C, 2F)
        zu = jnp.einsum("bnc,cf->bnf", x.astype(dt), wz)
        z, u = zu[..., :f], zu[..., f:]

        # Neighbor aggregates of Z over the kNN graph: one fused Pallas
        # pass on TPU (ops/edgeconv.py — the XLA gather runs at 58 GB/s
        # and its backward scatter-add at ~4 GB/s, measured); the
        # gather-based oracle elsewhere.
        from fpsg_tpu.ops.edgeconv import knn_aggregate, knn_aggregate_oracle

        pax = self.point_axis_name
        if pax is not None:
            from fpsg_tpu.parallel.sp import ring_knn_aggregate

            z_max, z_min, sum_z, sum_zsq = ring_knn_aggregate(
                x, z, self.k, pax)
        elif jax.default_backend() == "tpu" and n % 128 == 0:
            z_max, z_min, sum_z, sum_zsq = knn_aggregate(x, z, self.k)
        else:
            z_max, z_min, sum_z, sum_zsq = knn_aggregate_oracle(
                x, z, self.k)

        from fpsg_tpu.nn.pointnet import _with_point_axis

        stat_ax = _with_point_axis(self.axis_name, pax)
        bn = BatchNorm(axis_name=stat_ax, dtype=self.dtype,
                       two_pass=self.precise_stats, name="bn")
        n_pop = b * n * self.k
        if stat_ax is not None:
            n_pop *= jax.lax.psum(1, stat_ax)

        def pm(t):
            return jax.lax.pmean(t, stat_ax) \
                if stat_ax is not None else t

        if train:
            uf = u.astype(jnp.float32)
            mean = pm(
                jnp.mean(sum_z + self.k * uf, axis=(0, 1))
            ) / self.k                                         # (F,)
            if self.precise_stats:
                s_used = mean                  # exact two-pass algebra
            else:
                s_used = bn(None, True, return_shift=True,
                            param_shape_hint=(f,))
            t = uf - s_used[None, None, :]
            esq = pm(jnp.mean(
                sum_zsq + 2.0 * t * sum_z + self.k * t * t, axis=(0, 1)
            )) / self.k
            delta = mean - s_used
            var = jnp.maximum(esq - delta * delta, 0.0)
            k_aff, b_aff = bn(None, False, stats=(mean, var, n_pop),
                              return_affine=True)
        else:
            k_aff, b_aff = bn(None, True, return_affine=True,
                              param_shape_hint=(f,))

        extreme = jnp.where(k_aff[None, None, :] > 0, z_max, z_min)
        pre = (
            extreme.astype(jnp.float32) * k_aff[None, None, :]
            + u.astype(jnp.float32) * k_aff[None, None, :]
            + b_aff[None, None, :]
        )
        return jax.nn.leaky_relu(pre, 0.2).astype(dt)


class DGCNNFeat(nn.Module):
    """(B, N, 3) → (B, embedding_dim) global feature (dgcnn/model.py:45-88).

    ``dual_pool=True`` (reference default): conv5 maps to emb/2 channels and
    the output concatenates global max- and avg-pools.
    """

    embedding_dim: int = 1024
    k: int = 20
    dual_pool: bool = True
    axis_name: Optional[str] = None
    point_axis_name: Optional[str] = None  # see _EdgeConv; the final
                                           # global pools become pmax /
                                           # pmean over the sp axis
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        emb = self.embedding_dim // 2 if self.dual_pool else self.embedding_dim
        dt = self.dtype
        pax = self.point_axis_name
        ec = lambda feats, name: _EdgeConv(
            feats, self.k, self.axis_name, pax, dt,
            precise_stats=self.precise_stats, name=name)
        x1 = ec(64, "conv1")(x, train)
        x2 = ec(64, "conv2")(x1, train)
        x3 = ec(128, "conv3")(x2, train)
        x4 = ec(256, "conv4")(x3, train)
        h = jnp.concatenate([x1, x2, x3, x4], axis=-1)         # (B, N, 512)
        h = nn.Dense(
            emb,
            use_bias=False,
            kernel_init=torch_linear_kernel_init,
            dtype=dt,
            name="conv5",
        )(h)
        from fpsg_tpu.nn.pointnet import _with_point_axis

        h = BatchNorm(axis_name=_with_point_axis(self.axis_name, pax),
                      dtype=dt,
                      two_pass=self.precise_stats, name="bn5")(h, not train)
        h = jax.nn.leaky_relu(h, 0.2).astype(jnp.float32)
        mx = jnp.max(h, axis=1)
        if pax is not None:
            # all_gather + max rather than lax.pmax: pmax has no JAX
            # differentiation rule (same workaround as the PointNet
            # pool, nn/pointnet.py:_bn_maxpool)
            mx = jnp.max(jax.lax.all_gather(mx, pax), axis=0)
        if not self.dual_pool:
            return mx
        av = jnp.mean(h, axis=1)
        if pax is not None:
            # equal shard sizes: pmean of local means == global mean
            av = jax.lax.pmean(av, pax)
        return jnp.concatenate([mx, av], axis=-1)
