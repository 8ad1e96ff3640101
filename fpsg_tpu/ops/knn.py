"""k-nearest-neighbor indices for EdgeConv graph construction, TPU-native.

Replaces the reference's dense CUDA kNN (``src/dgcnn/model.py:13-20``;
SURVEY.md §2.4 N4): there, ``-|x_i - x_j|^2`` is formed as a full (N, N)
matrix and ``topk(k)`` picks neighbors (self included, since its distance 0
is the maximum of the negated distances).

Two implementations:

- **oracle**: MXU pairwise expansion + ``jax.lax.top_k`` — one fused XLA
  computation; right at the reference's operating point (N=2048, k=20,
  16 MB matrix).
- **pallas**: tiled kernel — each (TILE_N, N) distance block is computed on
  the MXU in VMEM and the k minima are extracted in-register by iterative
  min+mask, so the N^2 matrix never reaches HBM. This is the scale axis of
  the framework (SURVEY.md §5: the point-count analog of blockwise
  attention): at N=8192 the oracle would stream a 256 MB matrix per batch
  element; the kernel streams nothing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops.pairwise import pairwise_sqdist
from fpsg_tpu.ops._pallas_utils import interpret_default, round_up

_BIG = 1e30


def _knn_kernel_factory(k: int, tile_n: int):
    def kernel(xq_ref, xall_ref, idx_ref):
        xq = xq_ref[0]                                  # (TN, Cp)
        xa = xall_ref[0]                                # (N, Cp)
        xq_sq = jnp.sum(xq * xq, axis=1, keepdims=True)
        xa_sq = jnp.sum(xa * xa, axis=1, keepdims=True)
        cross = jax.lax.dot_general(
            xq, xa, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d = jnp.maximum(xq_sq - 2.0 * cross + xa_sq.T, 0.0)  # (TN, N)

        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        out_cols = jax.lax.broadcasted_iota(
            jnp.int32, (d.shape[0], k), 1
        )

        def extract(j, carry):
            d, acc = carry
            arg = jnp.argmin(d, axis=1).astype(jnp.int32)     # (TN,)
            # accumulate into column j without a dynamic store (Mosaic
            # requires 128-aligned dynamic indices in the lane dim)
            acc = jnp.where(out_cols == j, arg[:, None], acc)
            # mask the extracted minimum for the next pass
            return jnp.where(cols == arg[:, None], _BIG, d), acc

        acc0 = jnp.zeros((d.shape[0], k), jnp.int32)
        _, acc = jax.lax.fori_loop(0, k, extract, (d, acc0))
        idx_ref[0, :, :] = acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "tile_n", "interpret")
)
def _knn_pallas(
    x: jax.Array, k: int, tile_n: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = interpret_default()
    b, n, c = x.shape
    tile_n = min(tile_n, n)
    while n % tile_n != 0:
        tile_n //= 2
    cp = round_up(max(c, 8), 8 if c <= 8 else 128)
    if cp != c:
        x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (0, cp - c)))
    else:
        x = x.astype(jnp.float32)

    idx = pl.pallas_call(
        _knn_kernel_factory(k, tile_n),
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, cp), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cp), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_n, k), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, k), jnp.int32),
        interpret=interpret,
    )(x, x)
    return idx


@functools.partial(jax.jit, static_argnames=("k", "impl"))
def knn_indices(x: jax.Array, k: int = 20, *, impl: str = "auto") -> jax.Array:
    """Indices of the k nearest points (self included), ``(B, N, k)`` int32.

    Args:
      x: ``(B, N, C)`` point features (coordinates or embeddings).
      k: neighbors to select; matches reference default 20.
      impl: 'oracle' (materialized top_k), 'pallas' (tiled, no HBM N^2),
            or 'auto' (pallas once the matrix would exceed ~64 MB).
    """
    n = x.shape[-2]
    b = x.shape[0] if x.ndim == 3 else 1
    # Neighbor indices carry no gradient (the reference's topk indices are
    # equally non-differentiable); detaching also lets the Pallas kernel sit
    # inside differentiated graphs (pallas_call has no linearization rule).
    x = jax.lax.stop_gradient(x)
    if impl == "auto":
        # kernel wins when the batch's materialized distance matrices get
        # large (HBM traffic + slow top_k), or beyond N=4096 outright
        big = b * n * n * 4 > 256 * 2 ** 20
        impl = "pallas" if (n % 128 == 0 and (n > 4096 or big)) else "oracle"
    if impl == "pallas":
        return _knn_pallas(x, k)
    d = pairwise_sqdist(x, x)
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)
