"""Pallas 3x3 SAME conv vs the XLA oracle (exact on integer grids)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.ops.conv3x3 import conv3x3, conv3x3_oracle, conv3x3_same


@pytest.mark.parametrize("h,w,cin,cout,rt", [
    (8, 8, 8, 8, 4),       # multi-tile, small dims
    (16, 12, 16, 24, 8),   # cin != cout
    (14, 14, 32, 16, 14),  # single tile: both edge masks in one block
    (12, 10, 16, 24, 2),   # minimum tile
])
def test_matches_oracle_exactly(h, w, cin, cout, rt):
    # integer-valued inputs make the comparison exact (no rounding
    # ambiguity between accumulation orders)
    rng = np.random.RandomState(h * 100 + w)
    x = jnp.asarray(rng.randint(-3, 4, (2, h, w, cin)).astype(np.float32))
    wt = jnp.asarray(rng.randint(-2, 3, (3, 3, cin, cout)).astype(np.float32))
    y = conv3x3_same(x, wt, interpret=True, row_tile=rt)
    yo = conv3x3_oracle(x, wt)
    assert y.shape == yo.shape
    np.testing.assert_array_equal(np.asarray(y), np.asarray(yo))


@pytest.mark.parametrize("h,w,cin,cout", [
    (8, 8, 8, 8), (16, 12, 16, 24), (14, 14, 32, 16)])
def test_vjp_matches_oracle_exactly(h, w, cin, cout):
    rng = np.random.RandomState(h * 7 + w)
    x = jnp.asarray(rng.randint(-3, 4, (2, h, w, cin)).astype(np.float32))
    wt = jnp.asarray(rng.randint(-2, 3, (3, 3, cin, cout)).astype(np.float32))
    gy = jnp.asarray(rng.randint(-2, 3, (2, h, w, cout)).astype(np.float32))
    wk = wt.reshape(9 * cin, cout)

    gx_p, gw_p = jax.grad(
        lambda a, k: jnp.vdot(conv3x3(a, k, True), gy), argnums=(0, 1)
    )(x, wk)
    gx_o, gw_o = jax.grad(
        lambda a, k: jnp.vdot(conv3x3_oracle(a, k), gy), argnums=(0, 1)
    )(x, wt)
    np.testing.assert_array_equal(np.asarray(gx_p), np.asarray(gx_o))
    np.testing.assert_array_equal(
        np.asarray(gw_p.reshape(3, 3, cin, cout)), np.asarray(gw_o))


def test_same_padding_is_real_zeros():
    # an all-ones input exposes any halo/width-mask slip: border sums
    # differ from interior sums by exactly the padded tap count.
    x = jnp.ones((1, 8, 8, 8), jnp.float32)
    wt = jnp.ones((3, 3, 8, 8), jnp.float32)
    y = conv3x3_same(x, wt, interpret=True, row_tile=4)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(conv3x3_oracle(x, wt)))
    # corner = 4 taps, edge = 6, interior = 9 (x8 channels)
    assert float(y[0, 0, 0, 0]) == 4 * 8
    assert float(y[0, 0, 4, 0]) == 6 * 8
    assert float(y[0, 4, 4, 0]) == 9 * 8
