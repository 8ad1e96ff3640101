"""Auxiliary heads (reference ``src/models/support_models.py``).

- :class:`AuxClassifier` — the point-cloud-encoder pretraining head
  (support_models.py:6-29), used by the ``trainPointAE`` driver.
- :class:`FCMaskAllocater` — prototype-mask learner for the ``mask_*``
  aggregate modes. In the reference it is complete but never wired in
  (``build_model`` passes ``mask_allocater=None`` — SURVEY.md §5.1 item 10);
  kept here for component parity.
- :class:`TransMaskAllocater` — the reference version is an empty stub whose
  ``forward`` is ``pass`` (support_models.py:54-64); mirrored as an explicit
  NotImplementedError.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax

from fpsg_tpu.nn.normalization import BatchNorm


def _xavier_dense(features: int, name: str) -> nn.Dense:
    # Reference heads use xavier_normal_ weight init (support_models.py:26-29).
    return nn.Dense(
        features, kernel_init=nn.initializers.xavier_normal(), name=name
    )


class AuxClassifier(nn.Module):
    """1024 → 512 → 256 → n_cat log-softmax classifier, dropout .3."""

    out_dim: int
    dropout_rate: float = 0.3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bn = lambda name: BatchNorm(axis_name=self.axis_name, name=name)
        x = jax.nn.relu(bn("bn1")(_xavier_dense(512, "fc1")(x), not train))
        x = _xavier_dense(256, "fc2")(x)
        # Reference order: dropout inside bn2 (support_models.py:21).
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = jax.nn.relu(bn("bn2")(x, not train))
        x = _xavier_dense(self.out_dim, "fc3")(x)
        return jax.nn.log_softmax(x, axis=1)


class FCMaskAllocater(nn.Module):
    """[img_feat ‖ proto] → sigmoid mask over proto dims (parity component,
    dead in the reference main path)."""

    proto_dim: int = 1024
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        bn = lambda name: BatchNorm(axis_name=self.axis_name, name=name)
        x = jax.nn.relu(bn("bn1")(_xavier_dense(256, "fc1")(x), not train))
        x = jax.nn.relu(bn("bn2")(_xavier_dense(256, "fc2")(x), not train))
        return jax.nn.sigmoid(_xavier_dense(self.proto_dim, "fc3")(x))


class TransMaskAllocater(nn.Module):
    """Reference stub (support_models.py:54-64) — never implemented there."""

    hidden_dim: int = 256

    def __call__(self, query, key, value):
        raise NotImplementedError(
            "TransMaskAllocater is an empty stub in the reference "
            "(src/models/support_models.py:60-64)"
        )
