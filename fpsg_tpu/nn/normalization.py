"""Batch normalization with PyTorch semantics, multi-axis features, and
cross-replica statistics.

Why not ``flax.linen.BatchNorm``: parity with the reference requires
(a) torch's momentum convention (``running = (1-m)*running + m*batch``,
    m = 0.1),
(b) torch's *unbiased* variance in the running estimate while normalizing
    with the biased one (``torch.nn.BatchNorm1d`` behavior),
(c) per-(cluster, node) parameter/stat stacking for the fused decoder — the
    reference instantiates 16 separate ``PrimitiveNode`` BNs and 4 shared
    ``MLPDeformer`` BNs that are *called once per node* (reference
    ``src/models/point_cloud_net.py:44-55,66-80,97-110``), so a shared
    deformer BN sees per-node batch statistics but keeps a single running
    estimate updated sequentially, and
(d) ``pmean`` over a data-parallel mesh axis so sharded episodes reproduce
    single-device statistics (SURVEY.md §2.6 item 2).

Two TPU-bandwidth optimizations (both exact in expectation, measured on the
step trace — BASELINE.md round 2):

- **Folded preceding-layer bias** (``shift=``): a Conv/Dense bias feeding
  straight into BN is algebraically absorbed — it cancels out of the
  train-mode normalization (``x + b - mean(x + b) == x - mean(x)``), only
  offsets the *running-mean update*, and at eval folds into the per-channel
  affine. Passing the bias here instead of adding it to the activation
  removes one full read+write pass over the tensor per layer (and the bias
  gradient, which is analytically zero under BN, is exactly zero instead of
  rounding noise — torch's Adam random-walks conv biases on ~1e-10 noise
  gradients; ours freezes them; divergence documented in PARITY.md).
- **Single-read shifted variance** (``two_pass=False``): variance via
  ``E[(x - s)^2] - (E[x] - s)^2`` with ``s = running_mean - shift`` (a
  constant), so mean and variance come from ONE pass over the activation.
  Because ``s`` tracks the batch mean (and bias-folded conv outputs are
  ~zero-mean at init), the cancellation term ``(E[x]-s)^2`` stays tiny and
  accuracy matches the two-pass form; the result is clamped at 0. Keep
  ``two_pass=True`` where a channel can be near-constant at a large offset
  the running mean hasn't tracked yet (the decoder's B=1 conditioning
  pathology, DESIGN.md §8).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _canon(axes: Tuple[int, ...], ndim: int) -> Tuple[int, ...]:
    return tuple(a % ndim for a in axes)


@jax.custom_vjp
def _affine_relu(x: jax.Array, k: jax.Array, b: jax.Array) -> jax.Array:
    """``relu(x * k + b)`` with a hand-scheduled backward.

    k/b are per-channel broadcast-shaped (size-1 elsewhere). The backward
    is ONE fused pass over (y, g): the relu mask comes from the OUTPUT
    (same as torch's [pre>0] — at a tie both give 0), ``gx = m*g*k``, and
    the k/b cotangents come from two reduces of the same pass, recovering
    ``m*x`` as ``(m*y - m*b)/k`` so the pre-activation tensor is never
    saved or re-read. Measured perf-neutral vs letting XLA fuse the
    unfused chain (XLA already reaches the same pass structure); kept for
    the guaranteed single-pass backward and the smaller autodiff graph."""
    return jnp.maximum(x * k + b, 0)


def _affine_relu_fwd(x, k, b):
    y = jnp.maximum(x * k + b, 0)
    return y, (y, k, b)


def _affine_relu_bwd(res, g):
    y, k, b = res
    m = y > 0
    gm = jnp.where(m, g, jnp.zeros((), g.dtype))
    gx = (gm * k).astype(y.dtype)
    ra = tuple(
        i for i in range(y.ndim) if k.shape[i] == 1 and y.shape[i] != 1
    )
    acc = jnp.promote_types(g.dtype, jnp.float32)
    gmf = gm.astype(acc)
    gb = jnp.sum(gmf, axis=ra, keepdims=True)
    gmy = jnp.sum(gmf * y.astype(acc), axis=ra, keepdims=True)
    kf = k.astype(acc)
    # x is recovered as (y-b)/k; at k == 0 (scale exactly 0 — measure-zero
    # in training) that is undefined, so clamp the cotangent to 0 there
    # instead of NaN-poisoning the step.
    kf_safe = jnp.where(kf == 0, 1.0, kf)
    gk = jnp.where(
        kf == 0, 0.0, (gmy - b.astype(acc) * gb) / kf_safe
    )
    return gx, gk.astype(k.dtype), gb.astype(b.dtype)


_affine_relu.defvjp(_affine_relu_fwd, _affine_relu_bwd)


class BatchNorm(nn.Module):
    """Torch-semantics batch norm over arbitrary feature/group axes.

    Attributes:
      feature_axes: input axes whose dims shape the learned scale/bias AND
        the running statistics (e.g. ``(-1,)`` for a plain channel BN;
        ``(1, 2, -1)`` for per-(cluster, node, channel) stacked BNs).
      group_axes: extra input axes that receive *separate batch statistics*
        in training (each group normalizes with its own stats, emulating the
        reference's one-call-per-node pattern) while sharing a single running
        estimate, updated as if the groups had been processed sequentially
        in index order.
      momentum: torch convention — fraction of the new batch statistic.
      axis_name: optional mesh axis for cross-replica statistics.
      two_pass: True computes variance as ``E[(x-mu)^2]`` (a second read of
        the activation); False uses the single-read shifted form (module
        docstring) — the default for large-activation call sites.
      phase_groups: the input's LAST axis is ``G`` phase-tiled copies of
        the channel axis (``G*F`` wide, phase-major) that share parameters
        and statistics — the space-to-depth packed layout
        (:mod:`fpsg_tpu.nn.vgg`). Statistics are reduced at packed width
        and folded across phases on the (G, F) small side, and the affine
        is applied at packed width with phase-tiled k/b, so the big tensor
        never needs a 5-D reshape (which costs measured layout-conversion
        passes). Exact: the folded stats are over the identical element
        set as the unpacked layout's.
    """

    feature_axes: Tuple[int, ...] = (-1,)
    group_axes: Tuple[int, ...] = ()
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    two_pass: bool = True
    activation: Optional[str] = None  # "relu" fuses the activation into
                                      # the normalize affine with a
                                      # single-pass custom backward
                                      # (_affine_relu)
    phase_groups: int = 1

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        use_running_average: bool,
        shift: Optional[jax.Array] = None,
        *,
        stats: Optional[Tuple[jax.Array, jax.Array, int]] = None,
        return_affine: bool = False,
        return_shift: bool = False,
        param_shape_hint: Optional[Tuple[int, ...]] = None,
    ) -> jax.Array:
        """``shift``: per-feature bias of the preceding layer, folded in
        (shape ``param_shape`` or broadcastable to it). The module behaves
        exactly as if it had received ``x + expand(shift)``, without the
        full-tensor add ever happening.

        Fused-kernel modes (``x=None`` — the big tensor never passes
        through this module; a Pallas kernel computed its statistics and
        will apply the affine, see :mod:`fpsg_tpu.nn.fused_stack`):

          - ``stats=(mean, var, n)`` + ``return_affine=True``: mean/var
            are the batch statistics of the bias-less activation in
            ``param_shape``; performs the running-stat update exactly as
            the tensor path would (momentum, Bessel, shift fold) and
            returns the collapsed per-channel affine ``(k, b_eff)`` f32.
          - ``return_affine=True`` with ``use_running_average=True``:
            eval-mode affine from the running estimates.
          - ``return_shift=True``: returns the single-read stat shift
            ``stop_grad(running_mean - shift)`` — what a fused kernel
            subtracts before accumulating; reading it here keeps the
            running estimate owned by this module.
        """
        if x is None:
            pshape = stats[0].shape if stats is not None \
                else tuple(param_shape_hint)
            scale = self.param("scale", nn.initializers.ones, pshape)
            bias = self.param("bias", nn.initializers.zeros, pshape)
            ra_mean = self.variable(
                "batch_stats", "mean", lambda: jnp.zeros(pshape, jnp.float32)
            )
            ra_var = self.variable(
                "batch_stats", "var", lambda: jnp.ones(pshape, jnp.float32)
            )
            shift_p = None
            if shift is not None:
                shift_p = jnp.broadcast_to(shift, pshape).astype(jnp.float32)
            if return_shift:
                s = ra_mean.value
                if shift_p is not None:
                    s = s - shift_p
                return jax.lax.stop_gradient(s)
            assert return_affine
            if use_running_average:
                mean = ra_mean.value
                if shift_p is not None:
                    mean = mean - shift_p
                var = ra_var.value
            else:
                mean, var, n = stats
                mean = mean.astype(jnp.float32)
                var = var.astype(jnp.float32)
                if not self.is_initializing():
                    m = self.momentum
                    bessel = n / max(n - 1, 1)
                    up_mean = mean if shift_p is None else mean + shift_p
                    ra_mean.value = (
                        (1.0 - m) * ra_mean.value + m * up_mean
                    ).astype(ra_mean.value.dtype)
                    ra_var.value = (
                        (1.0 - m) * ra_var.value + m * var * bessel
                    ).astype(ra_var.value.dtype)
            k = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
            b_eff = bias.astype(jnp.float32) - mean * k
            return k, b_eff

        ndim = x.ndim
        f_axes = _canon(self.feature_axes, ndim)
        g_axes = _canon(self.group_axes, ndim)
        assert not set(f_axes) & set(g_axes)
        reduce_axes = tuple(
            i for i in range(ndim) if i not in f_axes and i not in g_axes
        )
        pg = self.phase_groups
        if pg > 1:
            assert f_axes == (ndim - 1,) and not g_axes, (
                "phase_groups requires a single trailing feature axis")
            param_shape: Tuple[int, ...] = (x.shape[-1] // pg,)
        else:
            param_shape = tuple(x.shape[a] for a in sorted(f_axes))

        def fold_pg(t):
            """Fold a keepdims full-width (…, G*F) statistic across the G
            phases into a (F,) param-shape array (mean over phases — each
            phase contributes the same number of elements)."""
            return jnp.mean(
                jnp.reshape(t, (pg, param_shape[0])), axis=0
            )

        scale = self.param("scale", nn.initializers.ones, param_shape)
        bias = self.param("bias", nn.initializers.zeros, param_shape)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(param_shape, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(param_shape, jnp.float32)
        )

        def expand(v):
            """Broadcast a (param_shape)-array to the input rank (tiled
            across the phase copies when phase_groups > 1)."""
            if pg > 1:
                v = jnp.tile(v, pg)
            shape = [1] * ndim
            for a, s in zip(sorted(f_axes), v.shape):
                shape[a] = s if pg == 1 else x.shape[a]
            return v.reshape(shape)

        # Statistics dtype: at least f32 (f64 under jax_enable_x64 inputs,
        # so golden-parity tests can compare against torch doubles exactly).
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        shift_e = None
        if shift is not None:
            shift_e = expand(
                jnp.broadcast_to(shift, param_shape)
            ).astype(stat_dtype)
        if use_running_average:
            mean = expand(ra_mean.value).astype(stat_dtype)
            if shift_e is not None:
                # Running mean was accumulated WITH the folded bias; the
                # input here is the bias-less activation.
                mean = mean - shift_e
            var = expand(ra_var.value).astype(stat_dtype)
        else:
            xf = x.astype(stat_dtype)
            # Per-(feature x group) batch statistics.
            mean_g = jnp.mean(xf, axis=reduce_axes, keepdims=True)
            n = 1
            for a in reduce_axes:
                n *= x.shape[a]
            if self.axis_name is not None:
                mean_g = jax.lax.pmean(mean_g, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            if pg > 1:
                # fold the packed-width mean across phases (each channel's
                # true mean over ALL its elements), re-tiled for broadcast
                mean_g = expand(fold_pg(mean_g))
                n *= pg
            if self.two_pass:
                # E[(x-mu)^2]: robust even for near-constant channels at a
                # large offset (the naive E[x^2]-E[x]^2 cancels
                # catastrophically there), at the cost of re-reading x.
                centered = xf - mean_g
                var_g = jnp.mean(centered * centered, axis=reduce_axes,
                                 keepdims=True)
                if self.axis_name is not None:
                    var_g = jax.lax.pmean(var_g, self.axis_name)
            else:
                # Single-read shifted variance (module docstring): both
                # statistics from one pass over x; s tracks the batch mean
                # so the subtraction below doesn't cancel.
                s = expand(ra_mean.value).astype(stat_dtype)
                if shift_e is not None:
                    s = s - shift_e
                s = jax.lax.stop_gradient(s)
                d = xf - s
                sq_g = jnp.mean(d * d, axis=reduce_axes, keepdims=True)
                if self.axis_name is not None:
                    sq_g = jax.lax.pmean(sq_g, self.axis_name)
                delta = mean_g - s
                var_g = jnp.maximum(sq_g - delta * delta, 0.0)
            if pg > 1:
                # delta/mean are phase-tiled, so folding the per-packed-
                # channel variance is exactly the full-element-set variance
                var_g = expand(fold_pg(var_g))
            mean, var = mean_g, var_g

            if self.is_initializing():
                pass
            elif pg > 1:
                m = self.momentum
                bessel = n / max(n - 1, 1)
                sm = fold_pg(
                    mean_g if shift_e is None else mean_g + shift_e
                )
                sv = fold_pg(var_g) * bessel
                ra_mean.value = (
                    (1.0 - m) * ra_mean.value + m * sm
                ).astype(ra_mean.value.dtype)
                ra_var.value = (
                    (1.0 - m) * ra_var.value + m * sv
                ).astype(ra_var.value.dtype)
            else:
                m = self.momentum
                bessel = n / max(n - 1, 1)

                # Collapse group axes as if updated sequentially in index
                # order: r' = (1-m)^G r + m * sum_g (1-m)^(G-1-g) s_g.
                def fold(stat_g):
                    s = jnp.squeeze(
                        stat_g,
                        axis=tuple(
                            a for a in reduce_axes
                        ),
                    )
                    # Now shaped by (group x feature) axes in input order;
                    # move group axes to the front, flatten.
                    remaining = [a for a in range(ndim) if a in f_axes or a in g_axes]
                    # s currently indexed by `remaining` in input order.
                    g_pos = [remaining.index(a) for a in sorted(g_axes)]
                    f_pos = [remaining.index(a) for a in sorted(f_axes)]
                    s = jnp.transpose(s, g_pos + f_pos)
                    n_groups = 1
                    for a in g_axes:
                        n_groups *= x.shape[a]
                    s = s.reshape((n_groups,) + param_shape)
                    w = m * (1.0 - m) ** jnp.arange(
                        n_groups - 1, -1, -1, dtype=jnp.float32
                    )
                    folded = jnp.tensordot(w, s, axes=(0, 0))
                    return folded, (1.0 - m) ** n_groups

                new_mean, decay = fold(
                    mean_g if shift_e is None else mean_g + shift_e
                )
                new_var, _ = fold(var_g * bessel)
                ra_mean.value = (
                    decay * ra_mean.value + new_mean
                ).astype(ra_mean.value.dtype)
                ra_var.value = (
                    decay * ra_var.value + new_var
                ).astype(ra_var.value.dtype)

        if return_affine:
            # Tensor-path affine extraction: statistics (and running
            # updates) computed from x exactly as the applying path
            # would, but the elementwise pass over the big tensor is the
            # CALLER's to fuse or commute — e.g. through a following
            # max-pool, where relu(k*max_n(y) + b) == max_n relu(k*y+b)
            # per channel (monotone affine for k>0; min_n for k<0), so
            # the activated tensor never materializes (nn/pointnet.py).
            k = jax.lax.rsqrt(var + self.epsilon) * expand(scale).astype(
                stat_dtype)
            b_eff = expand(bias).astype(stat_dtype) - mean * k
            return k, b_eff

        out_dtype = self.dtype or x.dtype
        fuse_relu = self.activation == "relu"
        if out_dtype == jnp.bfloat16 or fuse_relu:
            # Collapsed affine: k/b_eff are per-channel smalls computed in
            # f32; the elementwise pass over the big tensor is a single
            # FMA (one bf16 op in mixed precision instead of a partly-f32
            # sub/mul/mul/add chain), optionally with the relu fused in
            # via the single-pass custom backward.
            k = jax.lax.rsqrt(var + self.epsilon) * expand(scale).astype(
                stat_dtype)
            b_eff = expand(bias).astype(stat_dtype) - mean * k
            cd = out_dtype if out_dtype == jnp.bfloat16 else stat_dtype
            xc, kc, bc = x.astype(cd), k.astype(cd), b_eff.astype(cd)
            if fuse_relu:
                return _affine_relu(xc, kc, bc).astype(out_dtype)
            return xc * kc + bc
        if self.activation is not None:
            raise NotImplementedError(self.activation)
        y = (x.astype(stat_dtype) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * expand(scale) + expand(bias)
        return y.astype(out_dtype)
