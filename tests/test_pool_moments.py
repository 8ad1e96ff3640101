"""pool_moments kernel (interpret mode) vs oracle + fused VGG BN→pool
path vs the tensor-path fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.ops.pool_moments import pool_moments, pool_moments_oracle


@pytest.mark.parametrize("b,h,w2,c2,dt", [
    (2, 16, 8, 256, jnp.float32),
    (2, 14, 7, 256, jnp.float32),   # odd W/2, odd H/2 (conv5_3 shape)
    (2, 8, 6, 128, jnp.bfloat16),   # block-1 packed width (c2=128)
])
def test_forward_matches_oracle(b, h, w2, c2, dt):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    y = jax.random.normal(k1, (b, h, w2, c2), jnp.float32).astype(dt)
    s = jax.random.normal(k2, (c2,), jnp.float32)
    got = pool_moments(y, s)
    want = pool_moments_oracle(y, s)
    for g, w, tol in zip(got, want, (1e-4, 1e-4, 0.0, 0.0)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=tol)


def test_gradient_matches_oracle_no_ties():
    # distinct values -> tie semantics can't differ between the
    # first-index kernel routing and jnp's tie-splitting VJP
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    y = jax.random.normal(k1, (2, 8, 4, 256), jnp.float32)
    s = jax.random.normal(k2, (256,), jnp.float32)

    def loss(fn):
        def inner(yy):
            zs, zq, ymax, ymin = fn(yy, s)
            return (jnp.sum(zs * 0.3) + jnp.sum(zq * 0.1)
                    + jnp.sum(ymax * 1.7) - jnp.sum(ymin * 0.9))
        return inner

    g_k = jax.grad(loss(pool_moments))(y)
    g_o = jax.grad(loss(pool_moments_oracle))(y)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_o),
                               rtol=1e-5, atol=1e-5)


def test_bf16_affine_commutes_through_pool_bitwise():
    """The fused path's core identity at the production dtype:
    ``max_w relu(k*y+b) == relu(k*[max_w y | min_w y]+b)`` BITWISE in
    bf16, because per-channel affines are monotone (antitone for k<0)
    and fp rounding is monotone. Signs of k mixed; values include exact
    ties and zeros."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    y = jax.random.normal(k1, (2, 8, 6, 256), jnp.float32)
    # inject exact ties and zeros
    y = y.at[0, 0].set(y[0, 1]).at[1, 2:4].set(0.0).astype(jnp.bfloat16)
    k = (jax.random.normal(k2, (128,), jnp.float32)
         * jnp.where(jnp.arange(128) % 3 == 0, -1.0, 1.0))
    b = jax.random.normal(k3, (128,), jnp.float32)
    kb, bb = k.astype(jnp.bfloat16), b.astype(jnp.bfloat16)

    # fallback order: affine+relu per element (bf16), then pool
    act = jnp.maximum(y * jnp.tile(kb, 2) + jnp.tile(bb, 2), 0)
    e = [act.reshape(2, 4, 2, 6, 256)[:, :, dh, :, dw * 128:(dw + 1) * 128]
         for dh in (0, 1) for dw in (0, 1)]
    want = jnp.maximum(jnp.maximum(e[0], e[1]), jnp.maximum(e[2], e[3]))

    # fused order: pool raw y (max AND min), then affine+relu
    _, _, ymax, ymin = pool_moments_oracle(y, jnp.zeros(256))
    sel = jnp.where(k > 0, ymax, ymin).astype(jnp.bfloat16)
    got = jnp.maximum(sel * kb + bb, 0)

    assert jnp.array_equal(got, want.astype(jnp.bfloat16)), (
        np.abs(np.asarray(got, np.float32)
               - np.asarray(want, np.float32)).max())


def test_vmap_matches_oracle():
    """The train step vmaps episodes (even at E=1), so the kernel must
    be correct under the Pallas batching rule (batch grid dim +
    per-batch accumulator blocks)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    yp = jax.random.normal(k1, (3, 2, 8, 6, 256), jnp.float32)
    sp = jax.random.normal(k2, (3, 256), jnp.float32)

    got = jax.vmap(pool_moments)(yp, sp)
    want = jax.vmap(pool_moments_oracle)(yp, sp)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)

    def loss(fn):
        def inner(yy):
            zs, zq, ymax, ymin = jax.vmap(fn)(yy, sp)
            return (jnp.sum(zs * 0.3) + jnp.sum(zq * 0.1)
                    + jnp.sum(ymax * 1.7) - jnp.sum(ymin * 0.9))
        return inner

    g_k = jax.grad(loss(pool_moments))(yp)
    g_o = jax.grad(loss(pool_moments_oracle))(yp)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_o),
                               rtol=1e-5, atol=1e-5)


def test_tie_routing_is_first_window_index():
    # all four window elements equal: cotangent goes to the FIRST in
    # row-major (dh, dw) scan order (torch semantics), not split
    y = jnp.zeros((1, 4, 2, 256), jnp.float32)
    s = jnp.zeros((256,), jnp.float32)

    def loss(yy):
        return jnp.sum(pool_moments(yy, s)[2])

    g = jax.grad(loss)(y)
    # windows: rows (0,1)x phases; first element = row 0, phase 0
    # (channels 0:128). Each of the 2x2=4 output positions per 128-ch
    # block routes 1.0 there.
    assert float(g[0, 0, :, :128].sum()) == 2 * 128.0
    assert float(g[0, 0, :, 128:].sum()) == 0.0
    assert float(g[0, 1].sum()) == 0.0


def test_bn_pool_fused_single_site_matches_fallback(monkeypatch):
    """One conv→BN(+relu)→pool site, fused path (stats-injection +
    one-read kernel, forced on) vs the tensor path: output, gradient,
    and the BN running-stat update agree tightly."""
    import flax.linen as nn
    import fpsg_tpu.nn.vgg as vgg
    from fpsg_tpu.nn.normalization import BatchNorm

    class M(nn.Module):
        fused: bool

        @nn.compact
        def __call__(self, y, b):
            # phase_groups=2: params/stats at logical width like the
            # fused path's param_shape_hint (the block-1 configuration)
            bn = BatchNorm(two_pass=False, activation="relu",
                           phase_groups=2, name="bn")
            if self.fused:
                return vgg._bn_pool_fused(y, b, bn, None)
            return vgg._phase_max(bn(y, False, shift=b))

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    yp = jax.random.normal(k1, (2, 8, 6, 256), jnp.float32)
    b = jax.random.normal(k2, (128,), jnp.float32) * 0.1

    def run(fused):
        m = M(fused=fused)
        v = m.init(k3, yp, b)

        def loss(yy):
            out, mut = m.apply(v, yy, b, mutable=["batch_stats"])
            return jnp.sum(out ** 2), mut["batch_stats"]

        (l, stats), g = jax.value_and_grad(loss, has_aux=True)(yp)
        return l, stats, g

    monkeypatch.setattr(vgg, "_FORCE_POOL_KERNEL", True)
    l_fb, st_fb, g_fb = run(False)
    l_k, st_k, g_k = run(True)
    np.testing.assert_allclose(float(l_k), float(l_fb), rtol=1e-6)
    for a, bb in zip(jax.tree.leaves(st_k), jax.tree.leaves(st_fb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_fb),
                               rtol=1e-5, atol=1e-5)


def test_vgg_fused_pool_path_matches_fallback(monkeypatch):
    """Full VGG16-bn train step, fused BN→pool sites (forced interpret
    kernels) vs the tensor path: outputs and every BN running stat
    agree; gradients agree within the fallback's OWN epsilon-
    sensitivity. The single-site tests above hold at ~1e-6; at full
    depth the paths' ~1e-7 statistic reassociation flips maxpool
    routing at near-tie windows, rerouting O(1) cotangent — measured
    identical (leaf-for-leaf Frobenius) to perturbing the fallback's
    input by 1e-6, so the test compares against that self-calibrated
    noise floor instead of a fixed elementwise tolerance."""
    import fpsg_tpu.nn.vgg as vgg

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (2, 32, 32, 3), jnp.float32)
    m = vgg.VGG16BN()
    v = m.init({"params": k2}, x, True)

    def run(xx):
        def loss(p):
            out, mut = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, xx, True,
                mutable=["batch_stats"])
            return jnp.sum(out ** 2), (out, mut["batch_stats"])

        (l, (out, stats)), g = jax.value_and_grad(
            loss, has_aux=True)(v["params"])
        return l, out, stats, g

    l_fb, out_fb, st_fb, g_fb = run(x)
    _, _, _, g_noise = run(x + 1e-6 * jax.random.normal(k3, x.shape))
    monkeypatch.setattr(vgg, "_FORCE_POOL_KERNEL", True)
    l_k, out_k, st_k, g_k = run(x)

    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_fb),
                               rtol=1e-4, atol=5e-5)
    for a, b in zip(jax.tree.leaves(st_k), jax.tree.leaves(st_fb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for gk, gfb, gn in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_fb),
                           jax.tree.leaves(g_noise)):
        gk, gfb, gn = map(np.asarray, (gk, gfb, gn))
        ref = np.linalg.norm(gfb) + 1e-12
        frob = np.linalg.norm(gk - gfb) / ref
        floor = np.linalg.norm(gn - gfb) / ref
        assert frob <= max(3.0 * floor, 1e-4), (frob, floor)


def test_fwd_tile_byte_budget():
    """Regression: the f32 CLI path's conv2_2 pool site (B,112,56,256)
    overflowed Mosaic's 16 MB scoped VMEM by 1 KB at row tile 28 (the
    round-3e fix budgeted only the backward). The fwd tile choice must
    drop to 14 there while the measured-good bf16 production shapes
    keep tile 28 (BASELINE.md round-3e on-chip verification)."""
    from fpsg_tpu.ops._pallas_utils import pool_row_tile

    def fwd_tile(h, w2, c2, ib):
        per_th = 2 * w2 * c2 * (2 * ib + 8) + 2 * w2 * c2 * (ib + 1)
        return pool_row_tile(h // 2, row_bytes=per_th,
                             budget=14 * 1024 * 1024), per_th

    th, per = fwd_tile(112, 56, 256, 4)        # the f32 overflow shape
    assert th == 14 and th * per <= 14 * 1024 * 1024
    for (h, w2, c2) in [(224, 112, 128), (112, 56, 256), (56, 28, 512)]:
        th, per = fwd_tile(h, w2, c2, 2)       # bf16 production shapes
        assert th == 28, (h, w2, c2, th)
        assert th * per <= 14 * 1024 * 1024
