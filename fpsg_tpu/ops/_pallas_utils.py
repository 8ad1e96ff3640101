"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def interpret_default() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CPU tests/CI)."""
    return jax.default_backend() != "tpu"


def pad_points(p: jax.Array, d_pad: int = 8) -> jax.Array:
    """Zero-pad the coordinate axis of ``(..., N, D)`` points to ``d_pad``.

    TPU vector lanes want the trailing dim padded; zero coords do not change
    squared distances, mins, or argmins.
    """
    d = p.shape[-1]
    if d >= d_pad:
        return p
    pad = [(0, 0)] * (p.ndim - 1) + [(0, d_pad - d)]
    return jnp.pad(p, pad)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
