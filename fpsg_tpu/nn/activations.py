"""Activation registry mirroring the reference's ``get_activation``
(``src/models/point_cloud_net.py`` tail)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def relu(x: jax.Array) -> jax.Array:
    """ReLU whose VJP reads the OUTPUT instead of the input.

    ``d relu/dx = [y > 0]`` is identical to torch's ``[x > 0]`` convention
    (at x == 0 both give 0), but saving y instead of x lets XLA fuse the
    producer chain (BatchNorm normalize + relu) into one pass — the
    pre-activation tensor never needs to be materialized for the backward
    (measured ~2 ms/step of separate relu passes in the VGG trace).
    """
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros((), g.dtype)),)


relu.defvjp(_relu_fwd, _relu_bwd)


_ACTIVATIONS = {
    "relu": relu,
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
