"""Batched point scatter-add (segment-sum) as a Pallas mask kernel.

The chamfer backward routes per-point cotangents to nearest-neighbor
targets: ``out[b, j] = sum_{i : idx[b,i]==j} vals[b, i]``. XLA lowers
``segment_sum`` (a scatter-add) serially on TPU — the train-step trace
showed the two chamfer scatters at ~1 GB/s, 1.3 ms/step for
(32, 2048, 3) values. This kernel does the same reduction as dense
one-hot mask arithmetic on the VPU, entirely in VMEM:

  per row tile: mask (TN, M) = (iota_j == idx_i) is built in registers,
  and each coordinate column d contributes
  ``out[d, :] += sum_sublanes(where(mask, vals[:, d], 0))`` — a
  sublane reduce, no HBM index traffic at all. The output block
  (D_pad, M) stays VMEM-resident across a batch row's tiles.

The D coordinate axis (3 for points) rides sublanes of the output so
nothing is padded to 128 MXU lanes; the per-d unroll keeps only one
(TN, M) temporary live per round (DESIGN.md §11 Mosaic lessons).

Reference behavior: torch ``Tensor.index_add_`` /
``jax.ops.segment_sum`` as used by Kaolin-style chamfer backward
(SURVEY.md §2.4 N1).

Measured and REJECTED (step trace, B=32, N=M=2048): fusing the chamfer
backward's GATHER (y[idx]) into this mask kernel, so one mask build
serves both directions of the index routing. Neither variant beats the
plain composition (XLA take_along_axis + this kernel, 1.2 ms/step):
an MXU one-hot matmul gather wastes >90% of each K=M systolic pass on
Dp=8 output lanes (2.9 ms), and a per-column VPU mask gather doubles
the number of (TN, M) mask passes (1.7 ms) — the extra passes cost
more than the 41 GB/s XLA gather they replace.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpsg_tpu.ops._pallas_utils import interpret_default, round_up


def _segsum_kernel_factory(d_real: int, tile_n: int, m: int):
    def kernel(idx_ref, vals_ref, out_ref):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        idx = idx_ref[0]                                  # (TN, 1) i32
        vals = vals_ref[0]                                # (TN, Dp) f32
        cols = jax.lax.broadcasted_iota(jnp.int32, (tile_n, m), 1)
        # f32 0/1 mask + multiply measured faster than per-d selects
        # (1.28 vs 1.45 ms at B=32 N=M=2048); an MXU (8,TN)@(TN,M)
        # formulation measured no better (1.25) — mask generation is
        # the floor either way.
        mask = jnp.where(cols == idx, 1.0, 0.0)           # (TN, M)
        rows = []
        for d in range(d_real):
            v = vals[:, d:d + 1]                          # (TN, 1)
            rows.append(jnp.sum(mask * v, axis=0, keepdims=True))
        dp = out_ref.shape[1]
        if d_real < dp:
            rows.append(jnp.zeros((dp - d_real, m), jnp.float32))
        out_ref[0] += jnp.concatenate(rows, axis=0)       # (Dp, M)

    return kernel


@functools.partial(jax.jit, static_argnames=("size", "tile_n", "interpret"))
def _segment_sum_pallas(vals, idx, size: int, tile_n: int, interpret):
    b, n, d = vals.shape
    dp = round_up(max(d, 8), 8)
    out = pl.pallas_call(
        _segsum_kernel_factory(d, tile_n, size),
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, tile_n, 1), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n, d), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dp, size), lambda bi, i: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, dp, size), jnp.float32),
        interpret=interpret,
    )(idx[..., None], vals.astype(jnp.float32))
    return jnp.transpose(out[:, :d, :], (0, 2, 1))


def segment_sum_points(vals: jax.Array, idx: jax.Array, size: int,
                       *, impl: str = "auto",
                       tile_n: int = 256) -> jax.Array:
    """Batched segment-sum: scatter ``(B, N, D)`` vals into
    ``(B, size, D)`` f32 at ``idx (B, N)`` (int, values in [0, size)).

    impl: 'pallas' (VPU mask kernel), 'oracle' (vmapped
    ``jax.ops.segment_sum``), or 'auto' (pallas when shapes tile —
    N divisible by a power-of-two tile, lane-sized ``size``, small D).
    """
    b, n, d = vals.shape
    if impl == "auto":
        tn = min(tile_n, n)
        while tn > 1 and n % tn != 0:
            tn //= 2
        # off-TPU the interpret-mode kernel is pure overhead and its
        # different accumulation order perturbs CPU golden tests — keep
        # the XLA oracle there (same policy as chamfer's auto dispatch)
        impl = (
            "pallas"
            if (not interpret_default() and n % tn == 0 and tn >= 8
                and size % 128 == 0 and d <= 8)
            else "oracle"
        )
    if impl == "pallas":
        tn = min(tile_n, n)
        while n % tn != 0:
            tn //= 2
        return _segment_sum_pallas(vals, idx.astype(jnp.int32), size, tn,
                                   interpret_default())
    return jax.vmap(
        lambda v, i: jax.ops.segment_sum(
            v.astype(jnp.float32), i, num_segments=size)
    )(vals, idx)
