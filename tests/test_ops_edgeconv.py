"""Fused kNN+aggregate kernel (ops/edgeconv.py) vs the gather oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.ops.edgeconv import knn_aggregate, knn_aggregate_oracle


def test_knn_aggregate_matches_oracle(rng):
    x = jnp.array(rng.standard_normal((2, 128, 3)), jnp.float32)
    z = jnp.array(rng.standard_normal((2, 128, 70)), jnp.float32)
    fused = knn_aggregate(x, z, 8)
    oracle = knn_aggregate_oracle(x, z, 8)
    for a, b, name in zip(fused, oracle, ("max", "min", "sum", "sumsq")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)


def test_knn_aggregate_grad_matches_oracle(rng):
    """dZ through max/min (first-extracted tie routing == the oracle's
    topk-order routing for distinct values) and sum/sumsq paths."""
    x = jnp.array(rng.standard_normal((1, 64, 3)), jnp.float32)
    z = jnp.array(rng.standard_normal((1, 64, 33)), jnp.float32)
    w = jnp.array(rng.standard_normal((4, 33)), jnp.float32)

    def loss(agg):
        def f(z):
            mx, mn, sm, sq = agg(x, z, 8)
            return (jnp.sum(mx * w[0]) + jnp.sum(mn * w[1])
                    + jnp.sum(sm * w[2]) + jnp.sum(sq * w[3]))
        return jax.grad(f)(z)

    g_f = loss(lambda x, z, k: knn_aggregate(x, z, k))
    g_o = loss(knn_aggregate_oracle)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_o),
                               rtol=1e-4, atol=1e-5)


def test_knn_aggregate_x_nondiff(rng):
    x = jnp.array(rng.standard_normal((1, 64, 3)), jnp.float32)
    z = jnp.array(rng.standard_normal((1, 64, 16)), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(knn_aggregate(x, z, 4)[0]))(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
