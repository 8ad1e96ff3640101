"""Activation registry mirroring the reference's ``get_activation``
(``src/models/point_cloud_net.py`` tail)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "logsigmoid": jax.nn.log_sigmoid,
    "tanh": jnp.tanh,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.2),
}


def get_activation(name: str):
    try:
        return _ACTIVATIONS[name]
    except KeyError:
        raise NotImplementedError(f"Unsupported activation: {name}")
