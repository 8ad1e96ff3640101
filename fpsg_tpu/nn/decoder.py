"""Shape-primitive point-cloud decoder, fused for TPU.

Re-design of the reference's AtlasNet-style decoder
(``src/models/point_cloud_net.py:37-132``): ``num_clusters`` PrimitiveClusters,
each holding one shared MLPDeformer plus ``num_nodes`` PrimitiveNodes. The
reference executes these as **16 sequential Python-loop module calls per
forward** (SURVEY.md §3.4) — 16 chains of cuDNN launches. Here all cluster
and node parameters are stacked into leading axes and the whole decoder is a
handful of einsums:

    deformer:  (B,C,Nn,P,ori) x (C,ori,128) ...        per-cluster weights
    nodes:     (B,C,Nn,P,1539) x (C,Nn,1539,1539) ...  per-node weights

each of which is a single batched MXU matmul; XLA fuses the BN + activation
chains between them. One forward = one fused computation instead of 16
kernel-launch chains.

Semantics preserved exactly (see BatchNorm docstring for the per-node-stats
subtlety): widths ``d → d → d//2 → d//4 → 3`` with tanh output
(point_cloud_net.py:66-80), deformer ``ori → 128 → 128 → 3`` with tanh
(:44-55), template sampling per node (:98-100), conditioning vector tiled
across points (:105), output ordered cluster-major / node-mid / point-minor
(:107-110,131-132).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fpsg_tpu.nn.activations import get_activation
from fpsg_tpu.nn.normalization import BatchNorm
from fpsg_tpu.nn.templates import get_template


class _StackedDense(nn.Module):
    """Dense with parameters stacked over leading group axes.

    kernel: (*groups, d_in, d_out); applied as einsum so each group's slice
    multiplies its own weight — the vmap'd equivalent of N separate torch
    Conv1d(k=1) modules.
    """

    groups: tuple  # e.g. (C,) for per-cluster, (C, Nn) for per-node
    d_in: int
    d_out: int
    use_bias: bool = True
    fold_bias: bool = False  # return (y, bias) for BN folding instead of
                             # adding bias (normalization.py docstring)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Optional[jax.Array], *, params_only: bool = False):
        # x: (B, *groups, P, d_in)
        bound = (1.0 / self.d_in) ** 0.5

        def kinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param(
            "kernel", kinit, (*self.groups, self.d_in, self.d_out)
        )
        if params_only:
            # fused-kernel path (nn/fused_stack.py): hand the raw params
            # to the caller; this module stays the parameter owner so
            # checkpoints/goldens are unchanged
            bias = self.param(
                "bias", kinit, (*self.groups, self.d_out)
            ) if self.use_bias else None
            return kernel, bias
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        if len(self.groups) == 1:
            y = jnp.einsum("bcpd,cde->bcpe", x, kernel)
        elif len(self.groups) == 2:
            y = jnp.einsum("bcnpd,cnde->bcnpe", x, kernel)
        else:
            raise ValueError("1 or 2 group axes supported")
        if not self.use_bias:
            return y
        bias = self.param("bias", kinit, (*self.groups, self.d_out))
        if self.fold_bias:
            return y, bias
        return y + bias[None, ..., None, :].astype(dt)


class _StackedDenseSplitCond(nn.Module):
    """``node_conv1`` with the conditioning half of the matmul hoisted out
    of the point dimension.

    The reference tiles the 1536-d conditioning vector across all P points
    of a node and multiplies the full (1539, d_out) kernel per point
    (point_cloud_net.py:105-107) — P x redundant FLOPs on channels that are
    constant over points. By distributivity this is exactly

        y[b,c,n,p] = h[b] @ Wh[c,n]  +  d[b,c,n,p] @ Wd[c,n]  +  bias,

    with Wh/Wd the kernel's conditioning/point row blocks: the conditioning
    matmul runs ONCE per (b,c,n) instead of once per point (~P x fewer
    FLOPs on 1536 of 1539 input channels), and the (B,C,Nn,P,1539) concat
    tensor never exists in HBM. Parameter name/shape/init are identical to
    ``_StackedDense`` (kernel (C,Nn,d_cond+d_pt,d_out)), so checkpoints and
    golden tests are unchanged.
    """

    groups: tuple
    d_cond: int
    d_pt: int
    d_out: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, cond: Optional[jax.Array], pts: Optional[jax.Array],
                 *, params_only: bool = False):
        # cond: (B, d_cond); pts: (B, C, Nn, P, d_pt)
        d_in = self.d_cond + self.d_pt
        bound = (1.0 / d_in) ** 0.5

        def kinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param(
            "kernel", kinit, (*self.groups, d_in, self.d_out)
        )
        bias = self.param("bias", kinit, (*self.groups, self.d_out))
        if params_only:
            return kernel, bias
        dt = self.dtype or pts.dtype
        kh = kernel[..., : self.d_cond, :].astype(dt)
        kd = kernel[..., self.d_cond:, :].astype(dt)
        y_cond = jnp.einsum("be,cnef->bcnf", cond.astype(dt), kh)
        y_pt = jnp.einsum("bcnpd,cndf->bcnpf", pts.astype(dt), kd)
        # Bias is returned for BN folding (it is constant over the BN's
        # reduce axes; y_cond is NOT — it varies over B — so it stays a
        # tensor add, fused into the einsum epilogue).
        return y_pt + y_cond[:, :, :, None, :], bias


class PrimitiveDecoder(nn.Module):
    """(B, bottleneck) conditioning → (B, num_points, 3) point cloud.

    Template RNG comes from the flax 'template' RNG stream (explicit key
    discipline replaces the reference's in-place CUDA ``uniform_``).
    """

    num_clusters: int = 4
    num_nodes: int = 4
    num_points: int = 2048
    bottleneck_size: int = 1536
    ori_dim: int = 2           # template (original surface) dim
    raw_dim: int = 3           # deformed surface dim
    template_type: str = "SQUARE"
    activation: str = "relu"
    deformer_width: int = 128  # MLPDeformer layer_size (point_cloud_net.py:40)
    axis_name: Optional[str] = None
    point_axis_name: Optional[str] = None  # 'sp' mesh axis the POINT dim
                                           # is sharded over (parallel/sp):
                                           # each device generates
                                           # num_points/sp points; every
                                           # BN here reduces over P, so
                                           # the sp axis joins all stat
                                           # psums; template draws fold
                                           # in the device index. Forces
                                           # the unfused XLA node chain.
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False  # two-pass BN variance everywhere
    fused: str = "auto"        # node-chain execution: 'auto' (Pallas
                               # fused kernels on TPU — nn/fused_stack.py —
                               # unfused XLA elsewhere and under
                               # precise_stats), 'on', or 'off'

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        train: bool,
        template_points: Optional[jax.Array] = None,
    ) -> jax.Array:
        b = h.shape[0]
        c, nn_, w = self.num_clusters, self.num_nodes, self.deformer_width
        pax = self.point_axis_name
        act = get_activation(self.activation)
        d_node = self.raw_dim + self.bottleneck_size

        if template_points is None:
            ppn = self.num_points // c // nn_
            key = self.make_rng("template")
            if pax is not None:
                # num_points is GLOBAL: this instance generates its
                # shard, from a device-distinct template draw (the flax
                # rng is replicated across the mesh). Both collectives
                # bind only here, so init/apply with explicit
                # template_points work outside shard_map too.
                sp_size = int(jax.lax.psum(1, pax))  # static at trace time
                if ppn % sp_size != 0:
                    raise ValueError(
                        f"points-per-node {ppn} (num_points="
                        f"{self.num_points} / clusters={c} / nodes={nn_}) "
                        f"is not divisible by sp axis size {sp_size}: "
                        "devices would silently generate fewer than "
                        "num_points total points"
                    )
                ppn //= sp_size
                key = jax.random.fold_in(key, jax.lax.axis_index(pax))
            template = get_template(self.template_type)
            assert template.dim == self.ori_dim, (
                f"template dim {template.dim} != ori_dim {self.ori_dim}"
            )
            raw = template.get_random_points(
                key, (b, c, nn_, ppn, self.ori_dim)
            )
        else:
            raw = template_points                     # (B, C, Nn, P, ori)
            ppn = raw.shape[3]  # LOCAL points per node under sp

        # --- Shared-per-cluster deformer (MLPDeformer :44-55) -------------
        # BN: params/running stats per (cluster, channel); train-mode batch
        # stats per (cluster, node, channel) — the reference calls the
        # shared deformer once per node.
        # Fuse the activation into the BN affine when it is relu (the
        # reference default); other activations apply outside.
        fused_act = "relu" if self.activation == "relu" else None

        def post(t):
            return t if fused_act else act(t)

        from fpsg_tpu.nn.pointnet import _with_point_axis

        stat_ax = _with_point_axis(self.axis_name, pax)

        def dbn(name):
            return BatchNorm(
                feature_axes=(1, -1),
                group_axes=(2,),
                axis_name=stat_ax,
                dtype=self.dtype,
                two_pass=self.precise_stats,
                activation=fused_act,
                name=name,
            )

        if self.dtype is not None:
            raw = raw.astype(self.dtype)
        d, b1 = _StackedDense((c,), self.ori_dim, w, fold_bias=True,
                              dtype=self.dtype, name="deformer_conv1")(
            raw.reshape(b, c, nn_ * ppn, self.ori_dim)
        )
        d = d.reshape(b, c, nn_, ppn, w)
        d = post(dbn("deformer_bn1")(d, not train, shift=b1))
        d, b2 = _StackedDense((c,), w, w, fold_bias=True, dtype=self.dtype,
                              name="deformer_conv2")(
            d.reshape(b, c, nn_ * ppn, w)
        )
        d = d.reshape(b, c, nn_, ppn, w)
        d = post(dbn("deformer_bn2")(d, not train, shift=b2))
        d = jnp.tanh(
            _StackedDense((c,), w, self.raw_dim, dtype=self.dtype,
                          name="deformer_conv3")(
                d.reshape(b, c, nn_ * ppn, w)
            ).reshape(b, c, nn_, ppn, self.raw_dim)
        )

        # --- Conditioning: [h ‖ deformed] per point (:105-107), with the
        # constant-over-points conditioning matmul hoisted out of P (see
        # _StackedDenseSplitCond — exact by distributivity).
        if self.dtype is not None:
            h = h.astype(self.dtype)
            d = d.astype(self.dtype)

        # --- Per-node primitive MLPs (PrimitiveNode :66-80) ---------------
        # node_bn1 keeps the two-pass variance: at B=1 (query decode) the
        # conditioning matmul makes channels near-constant over the reduce
        # axes at a large offset — the one-pass form cancels there
        # (DESIGN.md §8). bn2/bn3 see post-ReLU activations (mean ~ std)
        # where the single-read shifted form is accurate.
        def nbn(name, two_pass):
            return BatchNorm(
                feature_axes=(1, 2, -1),
                axis_name=stat_ax,
                dtype=self.dtype,
                two_pass=two_pass,
                activation=fused_act,
                name=name,
            )

        dims = [d_node, d_node, d_node // 2, d_node // 4, 3]

        fused_on = (self.fused == "on" or (
            self.fused == "auto"
            and not self.precise_stats
            and self.activation == "relu"
            and jax.default_backend() == "tpu"
        )) and pax is None  # fused chain's stat psums don't join sp (yet)
        if fused_on:
            return self._fused_node_chain(h, d, train, nbn, dims)
        x, nb1 = _StackedDenseSplitCond(
            (c, nn_), h.shape[-1], self.raw_dim, dims[1],
            dtype=self.dtype, name="node_conv1",
        )(h, d)
        x = post(nbn("node_bn1", True)(x, not train, shift=nb1))
        for i in range(1, 3):
            x, nb = _StackedDense(
                (c, nn_), dims[i], dims[i + 1], fold_bias=True,
                dtype=self.dtype, name=f"node_conv{i + 1}",
            )(x)
            x = post(nbn(f"node_bn{i + 1}", self.precise_stats)(
                x, not train, shift=nb))
        x = jnp.tanh(
            _StackedDense((c, nn_), dims[3], dims[4], dtype=self.dtype,
                          name="node_conv4")(x)
        ).astype(jnp.float32)

        # cluster-major, node-mid, point-minor ordering (:107-110,131-132);
        # total = C*Nn*ppn (integer division like the reference, :89-95).
        return x.reshape(b, c * nn_ * ppn, 3)

    def _fused_node_chain(self, h, d, train, nbn, dims):
        """Node chain via the fused Pallas kernels (nn/fused_stack.py).

        Equivalent math to the unfused chain (equivalence-tested in
        tests/test_fused_decoder.py): each layer reads its input once and
        writes its output once; BatchNorm runs in stats-injection mode
        (owning params/running stats, never touching the big tensors).
        Activations live in group-major (C, Nn, R, d), R = B*P — only the
        small tensors (deformed points in, 3-d points out) transpose.
        """
        from fpsg_tpu.nn.fused_stack import (
            fused_l1_layer, fused_mid_layer, fused_out_layer,
        )

        b = h.shape[0]
        c, nn_ = self.num_clusters, self.num_nodes
        ppn = self.num_points // c // nn_
        r = b * ppn
        dt = d.dtype
        ax = self.axis_name

        def psum(t):
            return jax.lax.psum(t, ax) if ax is not None else t

        def pmean(t):
            return jax.lax.pmean(t, ax) if ax is not None else t

        n_rows = r * (jax.lax.psum(1, ax) if ax is not None else 1)

        # group-major deformed points, raw_dim zero-padded to 8 lanes
        dg = jnp.transpose(d, (1, 2, 0, 3, 4)).reshape(c, nn_, r,
                                                       self.raw_dim)
        dg = jnp.pad(dg, ((0, 0),) * 3 + ((0, 8 - self.raw_dim),))

        # --- L1: hoisted conditioning + tiny-K point matmul ---------------
        d_cond = h.shape[-1]
        k1_full, nb1 = _StackedDenseSplitCond(
            (c, nn_), d_cond, self.raw_dim, dims[1],
            dtype=self.dtype, name="node_conv1",
        )(None, None, params_only=True)
        kh = k1_full[..., :d_cond, :].astype(dt)
        kd = jnp.pad(
            k1_full[..., d_cond:, :],
            ((0, 0), (0, 0), (0, 8 - self.raw_dim), (0, 0)),
        ).astype(dt)
        y_cond = jnp.einsum("be,cnef->cnbf", h.astype(dt), kh)  # (C,Nn,B,F)
        yc_f = y_cond.astype(jnp.float32)
        bn1 = nbn("node_bn1", True)
        if train:
            mean_s = pmean(jnp.mean(yc_f, axis=2))              # (C,Nn,F)
            sc = yc_f - mean_s[:, :, None, :]
            var_s = pmean(jnp.mean(sc * sc, axis=2))
            y1, zs, zq, zc = fused_l1_layer(dg, kd, y_cond, sc, True, ppn)
            zs, zq, zc = psum(zs), psum(zq), psum(zc)
            mz = zs / n_rows
            # exact two-pass variance via the within/cov/between split
            # (fused_stack.py module docstring)
            mean1 = mz + mean_s
            var1 = (zq / n_rows - mz * mz) + 2.0 * zc / n_rows + var_s
            k1, b1 = bn1(None, False, shift=nb1, stats=(mean1, var1, n_rows),
                         return_affine=True)
        else:
            y1 = fused_l1_layer(
                dg, kd, y_cond, jnp.zeros_like(yc_f), False, ppn)[0]
            k1, b1 = bn1(None, True, shift=nb1, return_affine=True,
                         param_shape_hint=(c, nn_, dims[1]))

        # --- L2/L3: fused affine+relu -> matmul -> stats ------------------
        def mid(y_prev, k_prev, b_prev, i):
            w, nb = _StackedDense(
                (c, nn_), dims[i], dims[i + 1], fold_bias=True,
                dtype=self.dtype, name=f"node_conv{i + 1}",
            )(None, params_only=True)
            w = w.astype(dt)
            bnm = nbn(f"node_bn{i + 1}", self.precise_stats)
            hint = (c, nn_, dims[i + 1])
            if not train:
                y = fused_mid_layer(
                    y_prev, k_prev, b_prev, w,
                    jnp.zeros(hint, jnp.float32), False, ppn)[0]
                kk, bb = bnm(None, True, shift=nb, return_affine=True,
                             param_shape_hint=hint)
                return y, kk, bb
            s = bnm(None, True, shift=nb, return_shift=True,
                    param_shape_hint=hint)
            y, zs_, zq_ = fused_mid_layer(y_prev, k_prev, b_prev, w, s,
                                          True, ppn)
            zs_, zq_ = psum(zs_), psum(zq_)
            mz_ = zs_ / n_rows
            mean_ = mz_ + s                      # E[y] = E[z] + s
            var_ = jnp.maximum(zq_ / n_rows - mz_ * mz_, 0.0)
            kk, bb = bnm(None, False, shift=nb, stats=(mean_, var_, n_rows),
                         return_affine=True)
            return y, kk, bb

        y2, k2, b2 = mid(y1, k1, b1, 1)
        y3, k3, b3 = mid(y2, k2, b2, 2)

        # --- L4: affine+relu -> matmul + bias -> tanh ---------------------
        w4, bias4 = _StackedDense(
            (c, nn_), dims[3], dims[4], dtype=self.dtype, name="node_conv4",
        )(None, params_only=True)
        w4p = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, 8 - dims[4])))
        bias4p = jnp.pad(bias4, ((0, 0), (0, 0), (0, 8 - dims[4])))
        yout = fused_out_layer(y3, k3, b3, w4p.astype(dt), bias4p, ppn)
        yout = yout[..., :dims[4]]                          # (C,Nn,R,3) f32
        out = yout.reshape(c, nn_, b, ppn, dims[4])
        return jnp.transpose(out, (2, 0, 1, 3, 4)).reshape(
            b, c * nn_ * ppn, dims[4]
        )
