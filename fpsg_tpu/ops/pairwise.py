"""Pairwise squared-distance machinery shared by Chamfer / EMD / kNN.

The reference computes pairwise point distances inside external CUDA kernels
(Kaolin's chamfer, reference ``src/dgcnn/model.py:13-20`` for kNN). On TPU the
expansion ``|x|^2 + |y|^2 - 2 x.yT`` is the right decomposition: the cross term
is a (N,3)x(3,M) matmul that rides the MXU, and the norms are cheap VPU work
that XLA fuses into the same loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared Euclidean distances between two point sets.

    Args:
      x: ``(..., N, D)`` points.
      y: ``(..., M, D)`` points.

    Returns:
      ``(..., N, M)`` matrix of squared distances.

    Matches the math of the reference kNN (``src/dgcnn/model.py:14-16``,
    which computes the *negative* of this) and of Kaolin's chamfer cost.
    """
    # Compute in f32 regardless of input dtype: the -2xy^T expansion is
    # catastrophically cancellative in bf16.
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    x_sq = jnp.sum(x * x, axis=-1, keepdims=True)          # (..., N, 1)
    y_sq = jnp.sum(y * y, axis=-1, keepdims=True)          # (..., M, 1)
    # precision=HIGHEST: the default TPU matmul path decomposes f32 into
    # bf16 passes, which is far too coarse for nearest-neighbor argmins.
    cross = jnp.einsum(
        "...nd,...md->...nm",
        x,
        y,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d = x_sq - 2.0 * cross + jnp.swapaxes(y_sq, -1, -2)
    # Clamp tiny negative values produced by the expansion.
    return jnp.maximum(d, 0.0)
