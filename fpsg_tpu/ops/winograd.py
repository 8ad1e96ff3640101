"""Winograd F(2x2, 3x3) convolution — a FLOP-count cut for the VGG convs.

Targets the reference VGG16-bn feature stack (``src/models/image_net.py:
13-24``): the round-3f step trace has the unpacked 3x3 convs at 19.4 ms
@132 TF/s — at the XLA direct-conv ceiling. Every read-sharing Pallas
fusion of those convs has measured slower (DESIGN.md §14); the one lever
left is the FLOP COUNT itself. Winograd F(2,3) computes each 2x2 output
tile from a 4x4 input patch with 16 multiplies per (ci, co) pair instead
of the direct form's 36 — a 2.25x MAC reduction that applies equally to
the forward, the data gradient, and the weight gradient (JAX AD through
the transforms keeps the tile decomposition: dgrad is the inverse
transform transposed + 16 matmuls against U^T + a dilated patch-scatter;
wgrad is 16 (Ci, nTiles)@(nTiles, Co) matmuls + the G-transform
transpose — both 4/9 of the direct MACs).

The whole pipeline is pure XLA (no Pallas): 16 strided slices for the
overlapping 4x4 patches, hand-expanded +/- transforms (the B^T/A^T
matrices are 0/±1, G is 0/±0.5/1 — exact in binary), and one batched
einsum ``pnc,pcf->pnf`` that XLA runs as 16 MXU matmuls. The win
condition is measured per shape by ``benchmarks/winograd_probe.py``:
the transformed activations are 4x the input in HBM, so small-C layers
pay bandwidth where they save MACs; integration gates per-site on the
probe's verdict (like the fused-conv ``_FC_SKIP``).

Numerics: the transform coefficients are exact binary fractions; the
per-tap products are Winograd-polynomial evaluations whose rounding
differs from the direct conv in the LSBs (bf16: observed ~1e-2 relative
on unit-scale inputs; f32: ~1e-6). Downstream BN absorbs scale; maxpool
tie order can flip at exact ties (same caveat class as the packed
block-1 rewrite, DESIGN.md §12.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _input_transform(p):
    """B^T d B over the leading two 4x4 patch dims.

    p: (4, 4, ...) -> V: (4, 4, ...), hand-expanded 0/±1 adds.
    B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]].
    """
    # rows: t[u] = sum_a BT[u, a] * p[a]
    t0 = p[0] - p[2]
    t1 = p[1] + p[2]
    t2 = p[2] - p[1]
    t3 = p[1] - p[3]
    rows = (t0, t1, t2, t3)
    out = []
    for r in rows:
        out.append(jnp.stack(
            (r[0] - r[2], r[1] + r[2], r[2] - r[1], r[1] - r[3])))
    return jnp.stack(out)


def _weight_transform(w):
    """G g G^T: (3, 3, Ci, Co) -> (4, 4, Ci, Co).

    G = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]] — 0.5 is exact in
    binary, so the transform itself introduces no rounding beyond the
    adds."""
    g0, g1, g2 = w[0], w[1], w[2]
    h = 0.5
    r0 = g0
    r1 = h * (g0 + g1 + g2)
    r2 = h * (g0 - g1 + g2)
    r3 = g2
    rows = (r0, r1, r2, r3)
    out = []
    for r in rows:
        c0, c1, c2 = r[0], r[1], r[2]
        out.append(jnp.stack(
            (c0, h * (c0 + c1 + c2), h * (c0 - c1 + c2), c2)))
    return jnp.stack(out)


def _output_transform(m):
    """A^T M A: (4, 4, ...) -> (2, 2, ...).

    A^T = [[1,1,1,0],[0,1,-1,-1]]."""
    t0 = m[0] + m[1] + m[2]
    t1 = m[1] - m[2] - m[3]
    rows = (t0, t1)
    out = []
    for r in rows:
        out.append(jnp.stack(
            (r[0] + r[1] + r[2], r[1] - r[2] - r[3])))
    return jnp.stack(out)


@functools.partial(jax.jit, static_argnames=("acc_dtype",))
def winograd_conv3x3(x: jax.Array, w: jax.Array,
                     acc_dtype=jnp.float32) -> jax.Array:
    """3x3 SAME stride-1 conv, NHWC, via Winograd F(2x2, 3x3).

    x: (B, H, W, Ci) with H, W even; w: (3, 3, Ci, Co). Returns
    (B, H, W, Co) in x's dtype. Transforms run in ``acc_dtype``
    (default f32); the 16 tap matmuls run in the input dtype (bf16 in
    the production step) so the MXU rate matches the direct conv's.

    Equivalent to ``jax.lax.conv_general_dilated(x, w, (1,1), 'SAME',
    dimension_numbers=('NHWC','HWIO','NHWC'))`` up to Winograd rounding
    (see module docstring; tested in tests/test_ops_winograd.py).
    """
    b, hh, ww, ci = x.shape
    assert hh % 2 == 0 and ww % 2 == 0, (hh, ww)
    co = w.shape[3]
    ht, wt = hh // 2, ww // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # Overlapping 4x4 patches at stride 2 as 16 strided slices:
    # patch[a, b][n, i, j, c] = xp[n, 2i + a, 2j + b, c].
    patches = jnp.stack([
        jnp.stack([
            jax.lax.slice(
                xp, (0, a, bb, 0),
                (b, a + 2 * (ht - 1) + 1, bb + 2 * (wt - 1) + 1, ci),
                (1, 2, 2, 1))
            for bb in range(4)])
        for a in range(4)])                      # (4, 4, B, Ht, Wt, Ci)

    v = _input_transform(patches.astype(acc_dtype))
    u = _weight_transform(w.astype(acc_dtype))

    vf = v.reshape(16, b * ht * wt, ci).astype(x.dtype)
    uf = u.reshape(16, ci, co).astype(x.dtype)
    m = jnp.einsum("pnc,pcf->pnf", vf, uf,
                   preferred_element_type=acc_dtype)

    y = _output_transform(m.reshape(4, 4, b, ht, wt, co))
    # (2, 2, B, Ht, Wt, Co) -> (B, Ht, 2, Wt, 2, Co) -> (B, H, W, Co)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(b, hh, ww, co)
    return y.astype(x.dtype)
