"""moments_minmax kernel (interpret mode) vs the jnp oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.ops.moments import moments_minmax, moments_minmax_oracle


@pytest.mark.parametrize("b,n,f,dt", [
    (3, 512, 128, jnp.float32),
    (2, 384, 256, jnp.bfloat16),
])
def test_forward_matches_oracle(b, n, f, dt):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    y = jax.random.normal(k1, (b, n, f), jnp.float32).astype(dt)
    s = jax.random.normal(k2, (f,), jnp.float32)
    got = moments_minmax(y, s)
    want = moments_minmax_oracle(y, s)
    for g, w, tol in zip(got, want, (1e-4, 1e-4, 0.0, 0.0)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=tol)


def test_gradient_matches_oracle_no_ties():
    # distinct values -> tie semantics can't differ between the
    # first-index kernel routing and jnp's tie-splitting VJP
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    y = jax.random.normal(k1, (2, 256, 128), jnp.float32)
    s = jax.random.normal(k2, (128,), jnp.float32)

    def loss(fn):
        def inner(yy):
            zs, zq, ymax, ymin = fn(yy, s)
            return (jnp.sum(zs * 0.3) + jnp.sum(zq * 0.1)
                    + jnp.sum(ymax * 1.7) - jnp.sum(ymin * 0.9))
        return inner

    g_k = jax.grad(loss(moments_minmax))(y)
    g_o = jax.grad(loss(moments_minmax_oracle))(y)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_o),
                               rtol=1e-5, atol=1e-5)


def test_bn_maxpool_kernel_path_single_module(monkeypatch):
    """The kernel-backed _bn_maxpool (BN stats-injection + one-pass
    reduce) matches the tensor-path fallback bitwise-tight for a single
    module: output, gradient, and the BN running-stat update (the
    TPU-only fast path, forced on so CI exercises the injection wiring)."""
    import flax.linen as nn
    import fpsg_tpu.nn.pointnet as pn
    from fpsg_tpu.nn.normalization import BatchNorm

    class M(nn.Module):
        @nn.compact
        def __call__(self, y, b, train):
            bn = BatchNorm(two_pass=False, activation="relu", name="bn")
            return pn._bn_maxpool(y, b, bn, train, True, None)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    y = jax.random.normal(k1, (2, 256, 128), jnp.float32)
    b = jax.random.normal(k2, (128,), jnp.float32) * 0.1
    m = M()
    v = m.init(k3, y, b, True)

    def run():
        def loss(yy):
            out, mut = m.apply(v, yy, b, True, mutable=["batch_stats"])
            return jnp.sum(out ** 2), mut["batch_stats"]

        (l, stats), g = jax.value_and_grad(loss, has_aux=True)(y)
        return l, stats, g

    l_fb, st_fb, g_fb = run()
    monkeypatch.setattr(pn, "_FORCE_MOMENTS_KERNEL", True)
    l_k, st_k, g_k = run()
    np.testing.assert_allclose(float(l_k), float(l_fb), rtol=1e-6)
    for a, bb in zip(jax.tree.leaves(st_k), jax.tree.leaves(st_fb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_fb),
                               rtol=1e-5, atol=1e-5)


def test_vmap_matches_oracle():
    """The train step vmaps episodes (even at E=1), so the kernel must
    be correct under the Pallas batching rule (batch grid dim +
    per-batch accumulator blocks)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    y = jax.random.normal(k1, (3, 2, 64, 128), jnp.float32)  # (E, B, N, F)
    s = jax.random.normal(k2, (3, 128), jnp.float32)

    got = jax.vmap(moments_minmax)(y, s)
    want = jax.vmap(moments_minmax_oracle)(y, s)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)

    def loss(fn):
        def inner(yy):
            zs, zq, ymax, ymin = jax.vmap(fn)(yy, s)
            return (jnp.sum(zs * 0.3) + jnp.sum(zq * 0.1)
                    + jnp.sum(ymax * 1.7) - jnp.sum(ymin * 0.9))
        return inner

    g_k = jax.grad(loss(moments_minmax))(y)
    g_o = jax.grad(loss(moments_minmax_oracle))(y)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_o),
                               rtol=1e-5, atol=1e-5)


def test_tie_routing_is_first_index():
    # two equal maxima in a channel: all cotangent goes to the FIRST
    # (torch semantics), not split
    y = jnp.zeros((1, 8, 128), jnp.float32)
    y = y.at[0, 2, :].set(5.0).at[0, 6, :].set(5.0)
    s = jnp.zeros((128,), jnp.float32)

    def loss(yy):
        return jnp.sum(moments_minmax(yy, s)[2])

    g = jax.grad(loss)(y)
    assert float(g[0, 2].sum()) == 128.0
    assert float(g[0, 6].sum()) == 0.0
