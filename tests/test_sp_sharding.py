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
    from jax.experimental.shard_map import shard_map

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("dp", "sp"))
    x, y = _clouds(b=4, n=256, m=256, seed=4)

    fn = shard_map(
        lambda xl, yl: ring_chamfer(xl, yl, "sp"),
        mesh=mesh,
        in_specs=(P("dp", "sp", None), P("dp", "sp", None)),
        out_specs=P("dp"), check_rep=False,
    )
    got = fn(x, y)
    ref = chamfer_distance(x, y, impl="oracle")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
