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


def pool_row_tile(h2: int, row_bytes: int = 0,
                  budget: int = 2 * 1024 * 1024) -> int:
    """Row-tile size for the 2x2 pool kernels: largest candidate dividing
    the pooled row count (VGG sizes are 2^a*7^b, hence the 28/14/7s).

    ``row_bytes`` (bytes of ONE full-width f32 row-pair buffer) bounds
    the tile by a per-buffer VMEM budget: Mosaic gives each kernel a
    ~16 MB scoped-VMEM stack, and a kernel holding ~5 full-block f32
    temporaries overflows it once ``tile * row_bytes`` passes ~3 MB
    (measured: the pool_moments backward at (33,224,112,128) bf16 hit
    16.83 MB with tile 28 — 852 KB over). 2 MB/buffer keeps ~5
    temporaries near 10 MB with headroom for Mosaic's own spills."""
    for cand in (32, 28, 16, 14, 8, 7, 4, 2):
        if h2 % cand == 0 and (row_bytes == 0 or cand * row_bytes <= budget):
            return cand
    return 1


def packed_window_elems(x5, c: int):
    """The four 2x2-window elements of a row-split width-packed value
    ``(..., 2, W2, 2C)`` in torch's row-major (dh, dw) window scan order:
    dh = the row pair, dw = the channel phase (column parity)."""
    return [x5[..., dh, :, dw * c:(dw + 1) * c]
            for dh in (0, 1) for dw in (0, 1)]


def first_match_code(elems, target):
    """First window index (0..3) whose element equals ``target`` — the
    torch tie rule. Compare in f32 (no native bf16 vector compare on
    v5e); build at i32 tiling, convert once (i1->i8 select needs a
    relayout Mosaic rejects)."""
    ef = [e.astype(jnp.float32) for e in elems]
    tf = target.astype(jnp.float32)
    return jnp.where(
        ef[0] == tf, 0,
        jnp.where(ef[1] == tf, 1, jnp.where(ef[2] == tf, 2, 3)),
    ).astype(jnp.int8)
