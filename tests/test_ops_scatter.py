"""Pallas segment-sum scatter vs the vmapped segment_sum oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.ops.scatter import segment_sum_points


def _oracle(vals, idx, size):
    return jax.vmap(
        lambda v, i: jax.ops.segment_sum(
            v.astype(jnp.float32), i, num_segments=size)
    )(vals, idx)


@pytest.mark.parametrize("b,n,size,d", [
    (2, 512, 256, 3),
    (3, 2048, 2048, 3),
    (1, 384, 128, 8),
])
def test_pallas_matches_oracle(b, n, size, d):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vals = jax.random.normal(k1, (b, n, d), jnp.float32)
    idx = jax.random.randint(k2, (b, n), 0, size)
    got = segment_sum_points(vals, idx, size, impl="pallas")
    want = _oracle(vals, idx, size)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_collisions_and_empty_segments():
    # every row hits segment 0 or 5; most segments stay exactly zero
    vals = jnp.ones((1, 256, 3), jnp.float32)
    idx = jnp.where(jnp.arange(256) % 2 == 0, 0, 5)[None, :]
    out = segment_sum_points(vals, idx, 128, impl="pallas")
    assert out.shape == (1, 128, 3)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 128.0)
    np.testing.assert_allclose(np.asarray(out[0, 5]), 128.0)
    assert float(jnp.abs(out[0, 1:5]).sum()) == 0.0
    assert float(jnp.abs(out[0, 6:]).sum()) == 0.0


def test_auto_falls_back_on_untiled_shapes():
    # size not lane-sized -> oracle path, same answer
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    vals = jax.random.normal(k1, (2, 100, 3), jnp.float32)
    idx = jax.random.randint(k2, (2, 100), 0, 77)
    got = segment_sum_points(vals, idx, 77, impl="auto")
    want = _oracle(vals, idx, 77)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_bf16_vals_accumulate_f32():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    vals = jax.random.normal(k1, (1, 512, 3), jnp.bfloat16)
    idx = jax.random.randint(k2, (1, 512), 0, 128)
    got = segment_sum_points(vals, idx, 128, impl="pallas")
    want = _oracle(vals, idx, 128)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)
