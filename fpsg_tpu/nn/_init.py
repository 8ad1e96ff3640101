"""Parameter initializers matching PyTorch layer defaults.

torch ``Conv1d``/``Linear`` default-initialize weights with
``kaiming_uniform_(a=sqrt(5))`` and biases with ``U(-1/sqrt(fan_in),
1/sqrt(fan_in))``. For a 1x1 conv / linear layer both reduce to
``U(-1/sqrt(fan_in), +1/sqrt(fan_in))``. Matching the init distribution
keeps training trajectories comparable with the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Kernel init for Dense(kernel shape (..., fan_in, fan_out))."""
    fan_in = shape[-2]
    bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
