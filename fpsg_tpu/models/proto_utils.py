"""Legacy ProtoNet helpers (reference ``src/models/utils.py:98-118``) —
kept for component parity; not used by the main path."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def euclidean_dist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distances between feature sets:
    (N, D) x (M, D) → (N, M) (prototypical-network helper)."""
    assert x.shape[1] == y.shape[1], (
        "Inconsistent dimension between tensor X and Y"
    )
    return jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=2)


def build_pc_proto(
    ttl_class: int, pred_label: jax.Array, pc_proto_mat: jax.Array
) -> jax.Array:
    """Compose per-sample prototypes by one-hot selection:
    labels (N,) x prototype matrix (C, D) → (N, D)."""
    onehot = jax.nn.one_hot(pred_label.reshape(-1), ttl_class,
                            dtype=pc_proto_mat.dtype)
    return onehot @ pc_proto_mat
