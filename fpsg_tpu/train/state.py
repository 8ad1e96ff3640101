"""Training state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    step: jax.Array  # global step counter (drives the LR schedule)

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}
