"""Chamfer: pallas kernel vs jnp oracle vs a hand-rolled numpy reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.ops.chamfer import chamfer_distance, _nn_pallas_both, _nn_oracle


def chamfer_numpy(x, y, w1=1.0, w2=1.0):
    """Direct numpy re-statement of Kaolin semantics (mean of sq mins)."""
    out = []
    for xb, yb in zip(x, y):
        d = ((xb[:, None, :] - yb[None, :, :]) ** 2).sum(-1)
        out.append(w1 * d.min(1).mean() + w2 * d.min(0).mean())
    return np.array(out, np.float32)


@pytest.mark.parametrize("n,m", [(256, 256), (512, 384), (128, 128)])
def test_oracle_matches_numpy(rng, n, m):
    x = rng.standard_normal((3, n, 3), np.float32)
    y = rng.standard_normal((3, m, 3), np.float32)
    got = np.asarray(chamfer_distance(jnp.array(x), jnp.array(y), impl="oracle"))
    want = chamfer_numpy(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n,m", [(256, 256), (512, 256), (512, 320)])
def test_pallas_matches_oracle(rng, n, m):
    x = jnp.array(rng.standard_normal((2, n, 3), np.float32))
    y = jnp.array(rng.standard_normal((2, m, 3), np.float32))
    dxy_p, ixy_p, dyx_p, iyx_p = _nn_pallas_both(x, y)
    dxy_o, ixy_o = _nn_oracle(x, y)
    dyx_o, iyx_o = _nn_oracle(y, x)
    np.testing.assert_allclose(dxy_p, dxy_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(dyx_p, dyx_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(ixy_p, ixy_o)
    np.testing.assert_array_equal(iyx_p, iyx_o)


def test_weights(rng):
    x = jnp.array(rng.standard_normal((1, 128, 3), np.float32))
    y = jnp.array(rng.standard_normal((1, 128, 3), np.float32))
    got = chamfer_distance(x, y, w1=2.0, w2=0.5, impl="oracle")
    want = chamfer_numpy(np.asarray(x), np.asarray(y), 2.0, 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_identity_is_zero(rng):
    x = jnp.array(rng.standard_normal((2, 256, 3), np.float32))
    np.testing.assert_allclose(chamfer_distance(x, x), 0.0, atol=1e-6)


@pytest.mark.parametrize("impl", ["oracle", "pallas"])
def test_grad_matches_autodiff_of_oracle(rng, impl):
    """Custom VJP (gather/scatter form) == autodiff through the min."""
    x = jnp.array(rng.standard_normal((2, 128, 3), np.float32))
    y = jnp.array(rng.standard_normal((2, 160, 3), np.float32))

    def loss_custom(x, y):
        return chamfer_distance(x, y, w1=1.3, w2=0.7, impl=impl).sum()

    def loss_raw(x, y):
        d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
        return (1.3 * d.min(2).mean(1) + 0.7 * d.min(1).mean(1)).sum()

    gx_c, gy_c = jax.grad(loss_custom, argnums=(0, 1))(x, y)
    gx_r, gy_r = jax.grad(loss_raw, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(gx_c, gx_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gy_c, gy_r, rtol=1e-4, atol=1e-5)


def test_jit_and_vmap_compose(rng):
    x = jnp.array(rng.standard_normal((4, 256, 3), np.float32))
    y = jnp.array(rng.standard_normal((4, 256, 3), np.float32))
    f = jax.jit(lambda a, b: chamfer_distance(a, b, impl="oracle"))
    np.testing.assert_allclose(
        f(x, y), chamfer_numpy(np.asarray(x), np.asarray(y)), rtol=1e-5, atol=1e-6
    )


def test_masked_chamfer(rng):
    from fpsg_tpu.ops.chamfer import masked_chamfer_distance

    x_full = rng.standard_normal((1, 40, 3)).astype(np.float32)
    y_full = rng.standard_normal((1, 50, 3)).astype(np.float32)
    # pad with garbage beyond the valid prefix
    x_pad = np.concatenate(
        [x_full, 100 + rng.standard_normal((1, 24, 3)).astype(np.float32)], 1)
    y_pad = np.concatenate(
        [y_full, -100 + rng.standard_normal((1, 14, 3)).astype(np.float32)], 1)
    mask_x = np.arange(64)[None] < 40
    mask_y = np.arange(64)[None] < 50

    got = masked_chamfer_distance(
        jnp.array(x_pad), jnp.array(y_pad),
        jnp.array(mask_x), jnp.array(mask_y),
    )
    want = chamfer_numpy(x_full, y_full)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    # no masks == plain chamfer
    got2 = masked_chamfer_distance(jnp.array(x_full), jnp.array(y_full))
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-5)

    # differentiable
    g = jax.grad(lambda a: masked_chamfer_distance(
        a, jnp.array(y_pad), jnp.array(mask_x), jnp.array(mask_y)).sum()
    )(jnp.array(x_pad))
    assert np.isfinite(np.asarray(g)).all()
    # padded x points get zero gradient
    np.testing.assert_allclose(np.asarray(g)[0, 40:], 0.0, atol=1e-7)
