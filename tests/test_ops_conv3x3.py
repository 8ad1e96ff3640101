"""Pallas 3x3 SAME conv vs the XLA oracle (exact on integer grids)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.ops.conv3x3 import (
    conv3x3, conv3x3_oracle, conv3x3_same, conv_bn_fused)


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


def _unfused_reference(x, kin, bin_, wt, s, has_pro, has_epi):
    """The composite the fusion replaces: affine+relu -> conv -> shifted
    statistics, as plain jnp ops."""
    a = x
    if has_pro:
        # torch relu tie rule (zero gradient at pre == 0, matching the
        # production normalization._affine_relu custom VJP); the naive
        # jnp.maximum(pre, 0) routes tie gradients to the input.
        pre = (x * kin[None, None, None, :]
               + bin_[None, None, None, :])
        a = jnp.where(pre > 0, pre, 0.0)
    y = conv3x3_oracle(a, wt)
    if has_epi:
        z = y - s[None, None, None, :]
        return y, jnp.sum(z, axis=(0, 1, 2)), jnp.sum(z * z, axis=(0, 1, 2))
    cout = y.shape[-1]
    return y, jnp.zeros((cout,)), jnp.zeros((cout,))


@pytest.mark.parametrize("has_pro", [False, True])
@pytest.mark.parametrize("has_epi", [False, True])
def test_fused_conv_bn_matches_unfused_exactly(has_pro, has_epi):
    """Values AND all gradients (x, affine k/b, weights) of the fused
    kernel family equal the unfused composite, on integer grids where
    every accumulation order gives the same f32 answer."""
    h, w, cin, cout = 12, 10, 16, 24
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randint(-3, 4, (2, h, w, cin)).astype(np.float32))
    wt = jnp.asarray(rng.randint(-2, 3, (3, 3, cin, cout)).astype(np.float32))
    kin = jnp.asarray(rng.randint(-2, 3, (cin,)).astype(np.float32))
    bin_ = jnp.asarray(rng.randint(-2, 3, (cin,)).astype(np.float32))
    s = jnp.asarray(rng.randint(-2, 3, (cout,)).astype(np.float32))
    gy = jnp.asarray(rng.randint(-2, 3, (2, h, w, cout)).astype(np.float32))
    gzs = jnp.asarray(rng.randint(-2, 3, (cout,)).astype(np.float32))
    gzq = jnp.asarray(rng.randint(-2, 3, (cout,)).astype(np.float32))
    wk = wt.reshape(9 * cin, cout)

    def loss_f(x, kin, bin_, wk):
        y, zs, zq = conv_bn_fused(x, kin, bin_, wk, s, has_pro, has_epi,
                                  True)
        return jnp.vdot(y, gy) + jnp.vdot(zs, gzs) + jnp.vdot(zq, gzq)

    def loss_u(x, kin, bin_, wt):
        y, zs, zq = _unfused_reference(x, kin, bin_, wt, s, has_pro,
                                       has_epi)
        return jnp.vdot(y, gy) + jnp.vdot(zs, gzs) + jnp.vdot(zq, gzq)

    outs_f = conv_bn_fused(x, kin, bin_, wk, s, has_pro, has_epi, True)
    outs_u = _unfused_reference(x, kin, bin_, wt, s, has_pro, has_epi)
    for f, u, name in zip(outs_f, outs_u, ("y", "zsum", "zsq")):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(u),
                                      err_msg=name)

    g_f = jax.grad(loss_f, argnums=(0, 1, 2, 3))(x, kin, bin_, wk)
    g_u = jax.grad(loss_u, argnums=(0, 1, 2, 3))(x, kin, bin_, wt)
    np.testing.assert_array_equal(np.asarray(g_f[0]), np.asarray(g_u[0]),
                                  err_msg="gx")
    if has_pro:
        np.testing.assert_array_equal(np.asarray(g_f[1]), np.asarray(g_u[1]),
                                      err_msg="gk")
        np.testing.assert_array_equal(np.asarray(g_f[2]), np.asarray(g_u[2]),
                                      err_msg="gb")
    np.testing.assert_array_equal(
        np.asarray(g_f[3].reshape(3, 3, cin, cout)), np.asarray(g_u[3]),
        err_msg="gw")


@pytest.mark.parametrize("has_pro", [False, True])
@pytest.mark.parametrize("has_epi", [False, True])
def test_combined_backward_equals_split(has_pro, has_epi):
    """The one-kernel backward (dgrad+wgrad+affine-bwd fused; reads
    x/gy/y once) returns bit-identical results to the split kernels."""
    from fpsg_tpu.ops.conv3x3 import (
        _conv_cbwd_pallas, _conv_dgrad_pallas, _conv_wgrad_pallas,
        _rot180_swap)

    h, w, cin, cout = 12, 10, 16, 24
    rng = np.random.RandomState(3)
    f = lambda *s: jnp.asarray(rng.randint(-2, 3, s).astype(np.float32))
    x, gy, y = f(2, h, w, cin), f(2, h, w, cout), f(2, h, w, cout)
    kin, bin_ = f(cin), f(cin)
    s, gzs, gzq = f(cout), f(cout), f(cout)
    wk = f(9 * cin, cout)
    wkr = _rot180_swap(wk, cin, cout)

    gx_c, gk_c, gb_c, dw_c = _conv_cbwd_pallas(
        gy, y, x, kin, bin_, wkr, s, gzs, gzq, has_pro, has_epi, True, 4)
    gx_s, gk_s, gb_s = _conv_dgrad_pallas(
        gy, y, x, kin, bin_, wkr, s, gzs, gzq, has_pro, has_epi, True)
    dw_s = _conv_wgrad_pallas(
        x, kin, bin_, gy, y, s, gzs, gzq, has_pro, has_epi, True)
    np.testing.assert_array_equal(np.asarray(gx_c), np.asarray(gx_s))
    np.testing.assert_array_equal(np.asarray(dw_c), np.asarray(dw_s))
    if has_pro:
        np.testing.assert_array_equal(np.asarray(gk_c), np.asarray(gk_s))
        np.testing.assert_array_equal(np.asarray(gb_c), np.asarray(gb_s))


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
