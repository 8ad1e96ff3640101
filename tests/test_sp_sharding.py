"""Point-axis ('sp') sharding: ring chamfer vs the single-device oracle.

Runs on the conftest's 8-device virtual CPU mesh. The ring must match
``ops.chamfer.chamfer_distance`` in value and in gradient (up to tie
routing — inputs here are random, ties measure-zero).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fpsg_tpu.ops.chamfer import chamfer_distance
from fpsg_tpu.parallel.sp import chamfer_distance_sp, ring_chamfer


def _mesh(n=8, name="sp"):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), (name,))


def _clouds(b=3, n=256, m=384, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, m, 3)), jnp.float32)
    return x, y


def test_values_match_oracle():
    mesh = _mesh()
    x, y = _clouds()
    ref = chamfer_distance(x, y, impl="oracle")
    got = chamfer_distance_sp(x, y, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_asymmetric_weights_and_sizes():
    mesh = _mesh()
    x, y = _clouds(b=2, n=128, m=512, seed=1)
    ref = chamfer_distance(x, y, w1=0.3, w2=1.7, impl="oracle")
    got = chamfer_distance_sp(x, y, mesh, w1=0.3, w2=1.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_gradients_match_oracle():
    mesh = _mesh()
    x, y = _clouds(b=2, n=128, m=128, seed=2)

    gx_r, gy_r = jax.grad(
        lambda x, y: jnp.sum(chamfer_distance(x, y, impl="oracle")),
        (0, 1))(x, y)
    gx_s, gy_s = jax.grad(
        lambda x, y: jnp.sum(chamfer_distance_sp(x, y, mesh)), (0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy_s), np.asarray(gy_r),
                               rtol=1e-5, atol=1e-7)


def test_jit_with_sharded_inputs_stays_sharded():
    """The production pattern: inputs already sp-sharded on the mesh;
    jit(shard_map(ring)) consumes them without a gather."""
    mesh = _mesh()
    x, y = _clouds(b=2, n=512, m=512, seed=3)
    spec = NamedSharding(mesh, P(None, "sp", None))
    xs = jax.device_put(x, spec)
    ys = jax.device_put(y, spec)
    got = jax.jit(lambda a, b: chamfer_distance_sp(a, b, mesh))(xs, ys)
    ref = chamfer_distance(x, y, impl="oracle")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_composes_with_dp_axis():
    """2-D (dp, sp) mesh: episodes shard over dp, points over sp."""
    from jax import shard_map

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("dp", "sp"))
    x, y = _clouds(b=4, n=256, m=256, seed=4)

    fn = shard_map(
        lambda xl, yl: ring_chamfer(xl, yl, "sp"),
        mesh=mesh,
        in_specs=(P("dp", "sp", None), P("dp", "sp", None)),
        out_specs=P("dp"), check_vma=False,
    )
    got = fn(x, y)
    ref = chamfer_distance(x, y, impl="oracle")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def _shard_encoder(model, variables, x, mesh):
    from jax import shard_map

    def fwd(v, x_loc):
        out, mut = model.apply(v, x_loc, True, mutable=["batch_stats"])
        return out, mut

    return shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(None, "sp", None)),
        out_specs=(P(), P()), check_vma=False,
    )(variables, x)


_X64_WORKER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# note: the persistent compile cache does NOT shorten this subprocess
# (measured 321 s -> 326 s with it): its ~5 min is x64 trace+execute,
# not XLA compile
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
from fpsg_tpu.nn.pointnet import PointNetFeat

devs = jax.devices()
mesh = Mesh(np.array(devs[:8]), ("sp",))
rng = np.random.default_rng(5)
x = jnp.asarray(rng.standard_normal((4, 256, 3)), jnp.float64)

for ft in (False, True):
    ref_m = PointNetFeat(feature_transform=ft)
    sp_m = PointNetFeat(feature_transform=ft, point_axis_name="sp")
    v = ref_m.init(jax.random.PRNGKey(0), x, True)
    v = jax.tree.map(lambda a: a.astype(jnp.float64), v)

    (ref, _, _), ref_mut = ref_m.apply(v, x, True, mutable=["batch_stats"])

    def fwd(v, xl):
        (out, _, _), mut = sp_m.apply(v, xl, True, mutable=["batch_stats"])
        return out, mut

    got, got_mut = shard_map(
        fwd, mesh=mesh, in_specs=(P(), P(None, "sp", None)),
        out_specs=(P(), P()), check_vma=False)(v, x)
    d = float(jnp.max(jnp.abs(got - ref)))
    assert d < 1e-10, (ft, d)
    for a, b in zip(jax.tree.leaves(ref_mut), jax.tree.leaves(got_mut)):
        ds = float(jnp.max(jnp.abs(a - b)))
        assert ds < 1e-10, (ft, ds)

    # param grads
    params, bs = v["params"], v["batch_stats"]

    def loss_ref(p):
        (out, _, _), _ = ref_m.apply({"params": p, "batch_stats": bs}, x,
                                     True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    def loss_sp(p):
        out, _ = shard_map(
            fwd, mesh=mesh, in_specs=(P(), P(None, "sp", None)),
            out_specs=(P(), P()), check_vma=False)(
                {"params": p, "batch_stats": bs}, x)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_sp = jax.grad(loss_sp)(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-12)
        dg = float(jnp.max(jnp.abs(a - b)))
        # 1e-5*scale: the psum-tree reassociation's f64 rounding
        # amplifies to ~1e-6 RELATIVE through the BN-chain backward
        # (measured; plain jit-vs-eager of the unsharded model is
        # ~1e-13, and a finite-difference probe confirms both losses
        # are numerically identical — the grad map is just
        # ill-conditioned there). The semantic bug class this test
        # catches (running-var n inflation) shows at 1e-2 relative.
        assert dg < 1e-5 * scale + 1e-9, (ft, dg, scale)
print("SP_X64_OK")
"""


@pytest.mark.slow
def test_pointnet_sp_exact_in_x64():
    """Semantic equivalence witness: in f64 the point-sharded PointNet
    (fwd, running stats, param grads) is EXACTLY the unsharded model —
    the BN-moment psums and pool pmax reorder only f32 rounding. Runs
    in a subprocess because jax_enable_x64 is process-global."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    out = subprocess.run([sys.executable, "-c", _X64_WORKER], env=env,
                         cwd=repo, capture_output=True, text=True,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SP_X64_OK" in out.stdout


@pytest.mark.parametrize("feature_transform", [False, True])
def test_pointnet_sp_matches_unsharded(feature_transform):
    """f32 smoke of the same equivalence. Tolerance note: the sharded
    program reorders the BN-moment summations (psum trees), and f32
    rounding differences amplify through the normalization chain —
    measured 0.004/0.026 max drift here vs 1e-4/4e-4 for plain
    jit-vs-eager of the UNSHARDED model (same noise class, PARITY.md
    round-2 notes). The x64 subprocess test above is the exactness
    witness; this one pins that the f32 path runs and stays in that
    noise band."""
    from fpsg_tpu.nn.pointnet import PointNetFeat

    mesh = _mesh()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 256, 3)), jnp.float32)

    ref_m = PointNetFeat(feature_transform=feature_transform)
    sp_m = PointNetFeat(feature_transform=feature_transform,
                        point_axis_name="sp")
    variables = ref_m.init(jax.random.PRNGKey(0), x, True)
    (ref, _, _), ref_mut = ref_m.apply(variables, x, True,
                                       mutable=["batch_stats"])
    (got, _, _), got_mut = _shard_encoder(sp_m, variables, x, mesh)
    scale = float(np.abs(np.asarray(ref)).max())
    assert float(np.abs(np.asarray(got) - np.asarray(ref)).max()) \
        <= 0.05 * scale
    for a, b in zip(jax.tree.leaves(ref_mut), jax.tree.leaves(got_mut)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("b,n,sp", [(2, 256, 8), (4, 512, 8),
                                    (1, 1024, 4)])
def test_gradients_match_oracle_shape_sweep(b, n, sp):
    """Regression guard for the scan+ppermute AD misroute found in
    ring_knn_aggregate (jax 0.8; see parallel/sp.py docstring): that
    bug was SHAPE-dependent and invisible at the single shape the
    original grad test used. The chamfer ring's rotating-accumulator
    pattern measures clean across shapes — pin it."""
    devs = jax.devices()
    if len(devs) < sp:
        pytest.skip(f"needs {sp} devices")
    mesh = Mesh(np.array(devs[:sp]), ("sp",))
    rng = np.random.default_rng(b + n)
    x = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
    gx_r, gy_r = jax.grad(
        lambda a, c: jnp.sum(chamfer_distance(a, c, impl="oracle")),
        (0, 1))(x, y)
    gx_s, gy_s = jax.grad(
        lambda a, c: jnp.sum(chamfer_distance_sp(a, c, mesh)),
        (0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy_s), np.asarray(gy_r),
                               rtol=1e-5, atol=1e-7)
