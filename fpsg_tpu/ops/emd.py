"""Earth Mover's Distance via entropic-regularized (Sinkhorn) OT, TPU-native.

Replaces ``neuralnet_pytorch.metrics.emd_loss(..., sinkhorn=True)`` — a CUDA
extension in the reference (``src/models/utils.py:9-13``, used at
``src/models/few_shot.py:168``; SURVEY.md §2.4 N2).

Semantics: optimal-transport cost between two equal-weight point clouds with
uniform marginals, entropically regularized, solved by log-domain Sinkhorn
iterations (numerically stable at small epsilon). The returned value is the
transport cost ``<P, C>`` (without the entropy term), which converges to true
EMD as ``eps → 0``.

Gradient: envelope theorem — at the Sinkhorn fixed point the derivative of
the OT cost w.r.t. the cost matrix is the transport plan itself, so we
``stop_gradient`` the potentials and differentiate only through ``C``. This
avoids backprop through the iteration loop entirely (one O(N^2) matmul-like
pass in the backward instead of ``n_iters`` of them).

The whole computation is jnp: the inner logsumexp reductions over (N, M)
tiles are exactly what XLA fuses well on TPU; the cost-matrix construction is
an MXU matmul (see :mod:`fpsg_tpu.ops.pairwise`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from fpsg_tpu.ops.pairwise import pairwise_sqdist


def _logsumexp(a: jax.Array, axis: int) -> jax.Array:
    m = jax.lax.stop_gradient(jnp.max(a, axis=axis, keepdims=True))
    return jnp.squeeze(m, axis) + jnp.log(
        jnp.sum(jnp.exp(a - m), axis=axis)
    )


@functools.partial(
    jax.jit, static_argnames=("n_iters", "cost", "reduce")
)
def sinkhorn_emd(
    x: jax.Array,
    y: jax.Array,
    *,
    eps: float = 0.01,
    n_iters: int = 300,
    cost: str = "sqeuclidean",
    reduce: Optional[str] = None,
) -> jax.Array:
    """Sinkhorn-approximate EMD between point clouds.

    Args:
      x: ``(B, N, D)`` cloud.
      y: ``(B, M, D)`` cloud.
      eps: entropic regularization strength (absolute, in cost units).
      n_iters: Sinkhorn iterations.
      cost: 'sqeuclidean' (default) or 'euclidean' ground cost.
      reduce: None → ``(B,)``; 'sum'/'mean' → scalar over the batch
              (the reference calls with ``reduce='sum'``).

    Returns:
      Transport cost per batch element (or reduced scalar).
    """
    if x.ndim == 2:
        x = x[None]
    if y.ndim == 2:
        y = y[None]
    n, m = x.shape[-2], y.shape[-2]

    c = pairwise_sqdist(x, y)
    if cost == "euclidean":
        c = jnp.sqrt(jnp.maximum(c, 1e-12))
    elif cost != "sqeuclidean":
        raise ValueError(f"unknown ground cost: {cost}")

    log_mu = -jnp.log(jnp.float32(n))
    log_nu = -jnp.log(jnp.float32(m))
    c_sg = jax.lax.stop_gradient(c)

    def body(carry, _):
        f, g = carry
        # f_i = -eps * LSE_j[(g_j - C_ij)/eps + log nu_j]
        f = -eps * _logsumexp((g[..., None, :] - c_sg) / eps + log_nu, axis=-1)
        g = -eps * _logsumexp((f[..., :, None] - c_sg) / eps + log_mu, axis=-2)
        return (f, g), None

    f0 = jnp.zeros(c.shape[:-1], jnp.float32)
    g0 = jnp.zeros(c.shape[:-2] + (m,), jnp.float32)
    (f, g), _ = jax.lax.scan(body, (f0, g0), None, length=n_iters)

    # Transport plan (stop-gradient: envelope theorem).
    log_p = (
        (f[..., :, None] + g[..., None, :] - c_sg) / eps + log_mu + log_nu
    )
    p = jax.lax.stop_gradient(jnp.exp(log_p))
    out = jnp.sum(p * c, axis=(-2, -1))

    if reduce == "sum":
        return jnp.sum(out)
    if reduce == "mean":
        return jnp.mean(out)
    return out


def emd_wrapper(pc1: jax.Array, pc2: jax.Array) -> jax.Array:
    """Drop-in analog of the reference's ``emd_wrapper`` (utils.py:12-13)."""
    return sinkhorn_emd(pc1, pc2, reduce="sum")
