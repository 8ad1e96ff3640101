"""Backbone shape/behavior tests (PointNet, DGCNN, VGG, decoder)."""

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.nn import (
    DGCNNFeat,
    ImageEncoder,
    PointNetEncoder,
    PrimitiveDecoder,
    STN3d,
)
from fpsg_tpu.nn.templates import SquareTemplate, SphereTemplate, icosphere_vertices


def _init_apply(module, x, train=True, rngs=None):
    variables = module.init(
        {"params": jax.random.PRNGKey(0), **(rngs or {})}, x, train
    )
    out, _ = module.apply(
        variables, x, train, mutable=["batch_stats"], rngs=rngs
    )
    return out, variables


def test_stn3d_near_identity_at_init(rng):
    x = jnp.array(rng.standard_normal((4, 64, 3)), jnp.float32)
    out, _ = _init_apply(STN3d(), x)
    assert out.shape == (4, 3, 3)
    # identity-residual head: output close to I at init (zero-ish fc3)
    assert np.abs(np.asarray(out) - np.eye(3)).max() < 1.0


def test_pointnet_encoder_shape_and_permutation_invariance(rng):
    x = np.asarray(rng.standard_normal((2, 128, 3)), np.float32)
    enc = PointNetEncoder()
    feat, variables = _init_apply(enc, jnp.array(x), train=True)
    assert feat.shape == (2, 1024)

    # global max-pool → permutation invariant (eval mode: BN uses running
    # stats so per-point values don't depend on other points' order either)
    perm = rng.permutation(128)
    f1 = enc.apply(variables, jnp.array(x), False)
    f2 = enc.apply(variables, jnp.array(x[:, perm]), False)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_dgcnn_shape(rng):
    x = jnp.array(rng.standard_normal((2, 64, 3)), jnp.float32)
    feat, _ = _init_apply(DGCNNFeat(k=8), x)
    assert feat.shape == (2, 1024)


def test_dgcnn_single_pool(rng):
    x = jnp.array(rng.standard_normal((2, 64, 3)), jnp.float32)
    feat, _ = _init_apply(DGCNNFeat(k=8, dual_pool=False), x)
    assert feat.shape == (2, 1024)


def test_image_encoder_tiny(rng):
    x = jnp.array(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    feat, _ = _init_apply(ImageEncoder(backbone="tiny"), x)
    assert feat.shape == (2, 512)


def test_vgg16_shape(rng):
    x = jnp.array(rng.standard_normal((1, 224, 224, 3)), jnp.float32)
    feat, variables = _init_apply(ImageEncoder(backbone="vgg_16"), x)
    assert feat.shape == (1, 512)
    # 13 convs + 13 bns
    convs = [k for k in variables["params"]["encoder"] if "features_" in k]
    assert len(convs) == 26


def test_vgg_s2d_block1_rewrite_equivalence(rng):
    """Space-to-depth block 1 (nn/vgg.py _S2D_TAP comment) computes the
    SAME function as the direct 224^2 layout: identical params, matching
    forward, running-stat updates, and parameter gradients, in both stat
    modes. Uses a small even input (VGG is fully convolutional)."""
    from fpsg_tpu.nn.vgg import VGG16BN

    x = jnp.array(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    for precise in (False, True):
        direct = VGG16BN(s2d_block1=False, precise_stats=precise)
        packed = VGG16BN(s2d_block1=True, precise_stats=precise)
        variables = direct.init(jax.random.PRNGKey(0), x, True)
        # identical parameter trees: the packed path must accept the
        # direct path's variables verbatim (checkpoint compatibility)
        outs = {}
        for name, mod in [("direct", direct), ("packed", packed)]:
            y, mut = mod.apply(variables, x, True, mutable=["batch_stats"])
            outs[name] = (y, mut["batch_stats"])
        np.testing.assert_allclose(outs["packed"][0], outs["direct"][0],
                                   rtol=1e-3, atol=5e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4,
                                                    atol=1e-5),
            outs["packed"][1], outs["direct"][1],
        )
        # eval mode (running stats) agrees too
        ye_d = direct.apply(variables, x, False)
        ye_p = packed.apply(variables, x, False)
        np.testing.assert_allclose(ye_p, ye_d, rtol=1e-3, atol=5e-5)

        def loss(mod):
            def f(p):
                y, _ = mod.apply(
                    {"params": p,
                     "batch_stats": variables["batch_stats"]},
                    x, True, mutable=["batch_stats"])
                return jnp.sum(y ** 2)
            return jax.grad(f)(variables["params"])

        g_d, g_p = loss(direct), loss(packed)
        flat_d = jax.tree.leaves(g_d)
        flat_p = jax.tree.leaves(g_p)
        for a, b in zip(flat_p, flat_d):
            np.testing.assert_allclose(
                a, b, rtol=5e-3, atol=5e-4 * max(1.0, float(np.abs(b).max()))
            )


def test_decoder_shape_and_bounds(rng):
    dec = PrimitiveDecoder()
    h = jnp.array(rng.standard_normal((2, 1536)), jnp.float32)
    rngs = {"template": jax.random.PRNGKey(7)}
    out, variables = _init_apply(dec, h, train=True, rngs=rngs)
    assert out.shape == (2, 2048, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh output
    # stacked params: per-node conv kernels (C, Nn, d, d)
    k1 = variables["params"]["node_conv1"]["kernel"]
    assert k1.shape == (4, 4, 1539, 1539)


def test_decoder_template_rng_determinism(rng):
    dec = PrimitiveDecoder(num_clusters=2, num_nodes=2, num_points=128,
                           bottleneck_size=32)
    h = jnp.array(rng.standard_normal((1, 32)), jnp.float32)
    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "template": jax.random.PRNGKey(1)},
        h, True,
    )

    def run(seed):
        out, _ = dec.apply(
            variables, h, True, mutable=["batch_stats"],
            rngs={"template": jax.random.PRNGKey(seed)},
        )
        return np.asarray(out)

    np.testing.assert_array_equal(run(3), run(3))
    assert np.abs(run(3) - run(4)).max() > 0


def test_templates(rng):
    key = jax.random.PRNGKey(0)
    sq = SquareTemplate.get_random_points(key, (4, 8, 2))
    assert sq.shape == (4, 8, 2)
    assert (np.asarray(sq) >= 0).all() and (np.asarray(sq) < 1).all()

    sp = SphereTemplate.get_random_points(key, (4, 8, 3))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(sp), axis=-1), 1.0, atol=1e-5)
    # faithful reference bug: unnormalized gaussians
    spb = SphereTemplate.get_random_points(key, (4, 8, 3), faithful_bug=True)
    assert np.abs(np.linalg.norm(np.asarray(spb), axis=-1) - 1).max() > 0.1

    grid = SquareTemplate.get_regular_points(2048)
    assert grid.shape == (2025, 2)  # (sqrt(2048)=45)^2 grid, ref semantics
    ico = icosphere_vertices(2)
    np.testing.assert_allclose(np.linalg.norm(ico, axis=1), 1.0, atol=1e-6)
    assert ico.shape[0] == 162  # 10*4^2+2


def test_packed_pool_pallas_matches_xla(rng):
    """The Pallas packed-pool kernels (nn/vgg.py) == the sliced jnp path:
    forward, tie indices, and routed backward (interpreter mode)."""
    from fpsg_tpu.nn import vgg as V

    x = jnp.array(rng.standard_normal((2, 8, 4, 32)), jnp.float32)
    e = V._packed_pool_slices(x)
    y_ref = np.maximum.reduce([np.asarray(t) for t in e])
    y_pl, idx_pl = V._pool_pallas_fwd(x)
    np.testing.assert_array_equal(np.asarray(y_pl), y_ref)

    g = jnp.array(rng.standard_normal(y_ref.shape), jnp.float32)
    gx_pl = V._pool_pallas_bwd(idx_pl, g)
    # reference routed backward (the XLA path)
    idx_ref = np.asarray(
        np.where(e[0] == y_ref, 0,
                 np.where(e[1] == y_ref, 1,
                          np.where(e[2] == y_ref, 2, 3))), np.int8)
    np.testing.assert_array_equal(np.asarray(idx_pl), idx_ref)
    rows = []
    for dh in (0, 1):
        phases = [np.where(idx_ref == 2 * dh + dw, np.asarray(g), 0.0)
                  for dw in (0, 1)]
        rows.append(np.concatenate(phases, axis=-1))
    gx_ref = np.stack(rows, axis=2).reshape(2, 8, 4, 32)
    np.testing.assert_array_equal(np.asarray(gx_pl), gx_ref)
