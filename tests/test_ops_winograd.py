"""Winograd F(2x2, 3x3) conv equivalence vs the XLA direct conv.

The transform coefficients (0, ±1, ±0.5) are exact in binary, so f32
agreement with ``lax.conv_general_dilated`` is tight (~1e-6 relative);
bf16 runs the 16 tap matmuls at MXU precision with f32 transforms and
is bounded against the f32 truth no worse than the direct bf16 conv's
own distance (same criterion as the fused-conv chain tests).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.ops.winograd import winograd_conv3x3


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16, 8),      # small generic
    (1, 14, 14, 64, 32),   # VGG block-5 spatial size
    (3, 4, 10, 3, 5),      # non-square, tiny channels
])
def test_forward_f32(shape):
    b, h, w_, ci, co = shape
    rng = np.random.default_rng(0)
    x = _rand(rng, (b, h, w_, ci))
    w = _rand(rng, (3, 3, ci, co)) * 0.1
    ref = _direct(x, w)
    got = winograd_conv3x3(x, w)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref),
        rtol=1e-5, atol=1e-5 * float(jnp.max(jnp.abs(ref))))


def test_grads_f32():
    rng = np.random.default_rng(1)
    x = _rand(rng, (2, 12, 8, 24))
    w = _rand(rng, (3, 3, 24, 16)) * 0.1

    def loss(fn):
        return lambda x, w: jnp.sum(jnp.tanh(fn(x, w)))

    gx_r, gw_r = jax.grad(loss(_direct), (0, 1))(x, w)
    gx_w, gw_w = jax.grad(loss(winograd_conv3x3), (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_w), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_w), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-5)


def test_bf16_no_farther_than_direct_bf16():
    """bf16 Winograd must sit within ~2x the direct bf16 conv's own
    distance from the f32 truth (it reorders the same sums; the 2x
    headroom covers the polynomial-evaluation rounding)."""
    rng = np.random.default_rng(2)
    x32 = _rand(rng, (2, 16, 16, 64))
    w32 = _rand(rng, (3, 3, 64, 64)) * 0.1
    ref = np.asarray(_direct(x32, w32))
    d_dir = np.abs(np.asarray(
        _direct(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
    ).astype(np.float32) - ref).max()
    d_win = np.abs(np.asarray(
        winograd_conv3x3(x32.astype(jnp.bfloat16), w32.astype(jnp.bfloat16))
    ).astype(np.float32) - ref).max()
    scale = np.abs(ref).max()
    assert d_win <= max(2.0 * d_dir, 1e-2 * scale), (d_win, d_dir, scale)


def test_odd_spatial_rejected():
    x = jnp.zeros((1, 7, 8, 4))
    w = jnp.zeros((3, 3, 4, 4))
    with pytest.raises(AssertionError):
        winograd_conv3x3(x, w)


def test_vmap_batches():
    """The episode axis vmaps through (the E>1 / dp paths)."""
    rng = np.random.default_rng(3)
    x = _rand(rng, (2, 1, 8, 8, 8))
    w = _rand(rng, (3, 3, 8, 8)) * 0.1
    got = jax.vmap(lambda xi: winograd_conv3x3(xi, w))(x)
    ref = jax.vmap(lambda xi: _direct(xi, w))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_vgg_winograd_flag_equivalence():
    """VGG16-bn forward with winograd=True matches the direct-conv path
    (f32, train mode — statistics flow through the same BN modules)."""
    from fpsg_tpu.nn.vgg import VGG16BN

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    m_ref = VGG16BN(winograd=False)
    m_win = VGG16BN(winograd=True)
    variables = m_ref.init(jax.random.PRNGKey(0), x, True)
    r, _ = m_ref.apply(variables, x, True, mutable=["batch_stats"])
    w, _ = m_win.apply(variables, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(w), np.asarray(r),
                               rtol=5e-4, atol=5e-5)
