"""Fused BN→pool paths with axis_name inside shard_map == the plain
tensor path over the concatenated batch (cross-replica statistics psum
branch of _bn_maxpool / _bn_pool_fused, kernels forced to interpret)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

import fpsg_tpu.nn.pointnet as pn
import fpsg_tpu.nn.vgg as vgg
from fpsg_tpu.nn.normalization import BatchNorm
from fpsg_tpu.parallel import make_mesh


def _run_pair(module_cls, x, b, monkeypatch, force_attr):
    mesh = make_mesh(dp=8, mp=1)

    m_sync = module_cls(axis_name="dp")
    # init with the unbound-axis variant (identical param structure):
    # pmean is only valid inside the mapped context
    v = module_cls(axis_name=None).init(
        jax.random.PRNGKey(0), jnp.asarray(x[:2]), b)

    monkeypatch.setattr(*force_attr, True)

    def shard_fn(xs):
        y, mut = m_sync.apply(v, xs, b, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y_sh, st_sh = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P("dp"),), out_specs=(P("dp"), P()),
        check_vma=False,
    ))(jnp.asarray(x))

    monkeypatch.setattr(*force_attr, False)
    m_plain = module_cls(axis_name=None)
    y_pl, mut_pl = m_plain.apply(v, jnp.asarray(x), b,
                                 mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_pl),
                               rtol=1e-4, atol=1e-5)
    for a, bb in zip(jax.tree.leaves(st_sh),
                     jax.tree.leaves(mut_pl["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-6)


def test_bn_maxpool_cross_replica(rng, monkeypatch):
    class M(nn.Module):
        axis_name: str = None

        @nn.compact
        def __call__(self, y, b):
            bn = BatchNorm(two_pass=False, activation="relu",
                           axis_name=self.axis_name, name="bn")
            return pn._bn_maxpool(y, b, bn, True, True, None)

    x = rng.standard_normal((16, 32, 128)).astype(np.float32)
    b = rng.standard_normal(128).astype(np.float32) * 0.1
    _run_pair(M, x, jnp.asarray(b), monkeypatch,
              (pn, "_FORCE_MOMENTS_KERNEL"))


def test_bn_pool_fused_cross_replica(rng, monkeypatch):
    class M(nn.Module):
        axis_name: str = None

        @nn.compact
        def __call__(self, y, b):
            bn = BatchNorm(two_pass=False, activation="relu",
                           phase_groups=2, axis_name=self.axis_name,
                           name="bn")
            if vgg._FORCE_POOL_KERNEL:
                return vgg._bn_pool_fused(y, b, bn, None)
            return vgg._phase_max(bn(y, False, shift=b))

    x = rng.standard_normal((16, 8, 6, 256)).astype(np.float32)
    b = rng.standard_normal(128).astype(np.float32) * 0.1
    _run_pair(M, x, jnp.asarray(b), monkeypatch,
              (vgg, "_FORCE_POOL_KERNEL"))

def test_fused_conv_chain_cross_replica(rng, monkeypatch):
    """conv(F,T) -> stats injection -> conv(T,F) with axis_name inside
    shard_map == the same chain on the concatenated batch: the
    _inject_conv_stats psum makes every replica apply the GLOBAL batch
    affine in its conv prologue."""
    from fpsg_tpu.ops.conv3x3 import conv_bn_fused

    class M(nn.Module):
        axis_name: str = None

        @nn.compact
        def __call__(self, x, b):
            w1 = self.param("w1", nn.initializers.normal(0.3),
                            (3, 3, 8, 16))
            w2 = self.param("w2", nn.initializers.normal(0.3),
                            (3, 3, 16, 16))
            bn = BatchNorm(two_pass=False, activation="relu",
                           axis_name=self.axis_name, name="bn")
            s_c = bn(None, True, shift=b, return_shift=True,
                     param_shape_hint=(16,))
            z8 = jnp.zeros((8,), jnp.float32)
            y, zs, zq = conv_bn_fused(x, z8, z8, w1.reshape(72, 16), s_c,
                                      False, True, True)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            k2, b2 = vgg._inject_conv_stats(bn, s_c, zs, zq, n, b)
            y2, _, _ = conv_bn_fused(y, k2, b2, w2.reshape(144, 16),
                                     jnp.zeros((16,), jnp.float32),
                                     True, False, True)
            return y2

    x = rng.standard_normal((16, 8, 6, 8)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32) * 0.1
    mesh = make_mesh(dp=8, mp=1)
    m_sync = M(axis_name="dp")
    v = M(axis_name=None).init(jax.random.PRNGKey(0), jnp.asarray(x[:2]),
                               jnp.asarray(b))

    def shard_fn(xs):
        y, mut = m_sync.apply(v, xs, jnp.asarray(b),
                              mutable=["batch_stats"])
        return y, mut["batch_stats"]

    y_sh, st_sh = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P("dp"),), out_specs=(P("dp"), P()),
        check_vma=False,
    ))(jnp.asarray(x))
    y_pl, mut_pl = M(axis_name=None).apply(
        v, jnp.asarray(x), jnp.asarray(b), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_pl),
                               rtol=1e-4, atol=1e-5)
    for a, bb in zip(jax.tree.leaves(st_sh),
                     jax.tree.leaves(mut_pl["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-6)
