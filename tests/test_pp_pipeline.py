"""Pipeline ('pp') parallelism — GPipe schedule equivalence.

The pipeline is a pure function transform: its output must be bitwise
the composition of the stages, and jax.grad through the scan/ppermute
ring must match grads of the sequential composition. Runs on the fake
8-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from fpsg_tpu.parallel import (
    make_pp_mesh,
    pipeline_repeated,
    pipeline_stages,
    stack_stage_params,
)

S = 4       # stages
M = 6       # microbatches
D = 16      # feature width
B = 3       # rows per microbatch


def _stage(params, x):
    # One repeated block: dense + bias + gelu (nonlinear so grad
    # mistakes can't cancel).
    w, b = params["w"], params["b"]
    return jax.nn.gelu(x @ w + b)


def _make_params(key, n):
    ks = jax.random.split(key, 2 * n)
    return [
        {
            "w": jax.random.normal(ks[2 * i], (D, D)) / np.sqrt(D),
            "b": jax.random.normal(ks[2 * i + 1], (D,)) * 0.1,
        }
        for i in range(n)
    ]


def _sequential(params_list, x):
    for p in params_list:
        x = _stage(p, x)
    return x


@pytest.fixture(scope="module")
def mesh():
    return make_pp_mesh(S)


def test_repeated_forward_matches_sequential(mesh):
    params_list = _make_params(jax.random.PRNGKey(0), S)
    stacked = stack_stage_params(params_list)
    x = jax.random.normal(jax.random.PRNGKey(1), (M, B, D))

    run = pipeline_repeated(_stage, mesh, n_micro=M)
    got = jax.jit(run)(stacked, x)
    want = jax.vmap(lambda xm: _sequential(params_list, xm))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_repeated_grads_match_sequential(mesh):
    params_list = _make_params(jax.random.PRNGKey(2), S)
    stacked = stack_stage_params(params_list)
    x = jax.random.normal(jax.random.PRNGKey(3), (M, B, D))
    # A non-symmetric loss weight so per-microbatch grads differ.
    wgt = jax.random.normal(jax.random.PRNGKey(4), (M, B, D))

    run = pipeline_repeated(_stage, mesh, n_micro=M)

    def loss_pp(stacked, x):
        return jnp.sum(run(stacked, x) * wgt)

    def loss_seq(stacked, x):
        params_list = [jax.tree.map(lambda l: l[i], stacked)
                       for i in range(S)]
        y = jax.vmap(lambda xm: _sequential(params_list, xm))(x)
        return jnp.sum(y * wgt)

    gp, gx = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stacked, x)
    sp_, sx = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(sp_)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(sx),
                               rtol=2e-5, atol=2e-6)


def test_repeated_params_actually_pp_sharded(mesh):
    """Each device must hold only its stage's slice of the stacked
    params (the memory-scaling claim, not just correctness)."""
    params_list = _make_params(jax.random.PRNGKey(5), S)
    stacked = stack_stage_params(params_list)
    sharded = jax.device_put(
        stacked, NamedSharding(mesh, P("pp")))
    x = jax.random.normal(jax.random.PRNGKey(6), (M, B, D))

    run = jax.jit(pipeline_repeated(_stage, mesh, n_micro=M))
    got = run(sharded, x)
    want = jax.vmap(lambda xm: _sequential(params_list, xm))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # The sharded leaf's per-device shard is 1/S of the stage axis.
    w = sharded["w"]
    shard_shapes = {tuple(s.data.shape) for s in w.addressable_shards}
    assert shard_shapes == {(1, D, D)}, shard_shapes


def test_heterogeneous_stages_conv_pool_dense(mesh):
    """Different activation shape at every boundary: conv (8x8x4) →
    pool (4x4x8) → flatten-dense (32) → dense (5)."""
    k = jax.random.split(jax.random.PRNGKey(7), 8)

    def conv(p, x):  # (8,8,4) -> (8,8,8)
        y = jax.lax.conv_general_dilated(
            x[None], p, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        return jax.nn.relu(y)

    def pool(p, x):  # (8,8,8) -> (4,4,8), p is a scale
        y = x.reshape(4, 2, 4, 2, 8).max(axis=(1, 3))
        return y * p

    def dense1(p, x):  # (4,4,8) -> (32,)
        return jnp.tanh(x.reshape(-1) @ p)

    def dense2(p, x):  # (32,) -> (5,)
        return x @ p

    params = (
        jax.random.normal(k[0], (3, 3, 4, 8)) * 0.3,
        jnp.float32(1.7),
        jax.random.normal(k[1], (128, 32)) * 0.1,
        jax.random.normal(k[2], (32, 5)) * 0.3,
    )
    fns = [conv, pool, dense1, dense2]
    x = jax.random.normal(k[3], (M, 8, 8, 4))

    run = pipeline_stages(fns, mesh)
    got = jax.jit(run)(params, x)

    def seq_one(params, xm):
        a = xm
        for f, p in zip(fns, params):
            a = f(p, a)
        return a

    want = jax.vmap(lambda xm: seq_one(params, xm))(x)
    assert got.shape == (M, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # Grads wrt every stage's params and the input.
    wgt = jax.random.normal(k[4], (M, 5))

    def loss_pp(params, x):
        return jnp.sum(run(params, x) * wgt)

    def loss_seq(params, x):
        y = jax.vmap(lambda xm: seq_one(params, xm))(x)
        return jnp.sum(y * wgt)

    gp, gx = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(params, x)
    sp_, sx = jax.jit(jax.grad(loss_seq, argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(sp_)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(sx),
                               rtol=3e-5, atol=3e-6)


def test_pp_composes_with_dp():
    """2-D (dp=2, pp=4) mesh: each dp row runs the SAME pipeline over
    its shard of microbatches — the GPipe body only names the 'pp'
    axis, so dp composition is pure sharding (no code change)."""
    import numpy as np_
    from jax import shard_map
    from jax.sharding import Mesh

    from fpsg_tpu.parallel.pp import _gpipe_local_repeated

    devices = jax.devices()
    mesh2 = Mesh(np_.array(devices[:8]).reshape(2, 4), ("dp", "pp"))
    params_list = _make_params(jax.random.PRNGKey(30), S)
    stacked = stack_stage_params(params_list)
    m_total = 8                      # 4 microbatches per dp row
    x = jax.random.normal(jax.random.PRNGKey(31), (m_total, B, D))

    import functools

    body = functools.partial(_gpipe_local_repeated, _stage, True,
                             m_total // 2, "pp")
    # stage axis is dim 1 under the (dp, pp) layout: add a leading
    # broadcast dim so P(None, 'pp') shards stages over pp only.
    stacked2 = jax.tree.map(lambda l: l[None], stacked)

    def body2(st, xs):
        return body(jax.tree.map(lambda l: l[0], st), xs)

    run = shard_map(
        body2, mesh=mesh2,
        in_specs=(P(None, "pp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    got = jax.jit(run)(stacked2, x)
    want = jax.vmap(lambda xm: _sequential(params_list, xm))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_repeated_rejects_wrong_stage_count(mesh):
    """8 stacked stages on a 4-device pp mesh must raise, not silently
    compute with every 2nd stage (P('pp') would shard 2-per-device and
    the local slice takes index 0)."""
    params_list = _make_params(jax.random.PRNGKey(20), 2 * S)
    stacked = stack_stage_params(params_list)
    x = jax.random.normal(jax.random.PRNGKey(21), (M, B, D))
    run = pipeline_repeated(_stage, mesh, n_micro=M)
    with pytest.raises(ValueError, match="stage axis"):
        run(stacked, x)


def test_bubble_edge_fewer_microbatches_than_stages(mesh):
    """M < S: the schedule is mostly bubble but the outputs (and the
    n_micro=1 degenerate case) must still be exact."""
    params_list = _make_params(jax.random.PRNGKey(10), S)
    stacked = stack_stage_params(params_list)
    run1 = pipeline_repeated(_stage, mesh, n_micro=1, remat=False)
    run2 = pipeline_repeated(_stage, mesh, n_micro=2)
    for run, m in ((run1, 1), (run2, 2)):
        x = jax.random.normal(jax.random.PRNGKey(11 + m), (m, B, D))
        got = jax.jit(run)(stacked, x)
        want = jax.vmap(lambda xm: _sequential(params_list, xm))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
