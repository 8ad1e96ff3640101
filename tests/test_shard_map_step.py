"""Explicit shard_map trainer: runs on the 8-device mesh, agrees with the
implicit (vmap + sharding-constraint) formulation."""

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.parallel import make_mesh
from fpsg_tpu.parallel.shard_step import make_shard_map_train_step
from test_train_step import build


def test_shard_map_step_runs_and_decreases():
    mesh = make_mesh(dp=8, mp=1)
    model, corpus, state, _, tx = build(n_episodes=8)
    step = make_shard_map_train_step(model, tx, n_support=3, n_query=1,
                                     mesh=mesh)
    losses = []
    for i in range(6):
        state, m = step(state, corpus, jax.random.PRNGKey(i))
        assert m["query_rec_loss"].shape == (8,)
        losses.append(float(jnp.mean(m["query_rec_loss"])))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-2:]) < np.mean(losses[:2]), losses


def test_shard_map_grads_are_synced():
    """After one step, params must be identical across devices (psum'd)."""
    mesh = make_mesh(dp=8, mp=1)
    model, corpus, state, _, tx = build(n_episodes=8, sgd=True)
    step = make_shard_map_train_step(model, tx, n_support=3, n_query=1,
                                     mesh=mesh)
    new_state, _ = step(state, corpus, jax.random.PRNGKey(0))
    # replicated output: every shard holds the same updated params
    leaf = jax.tree.leaves(new_state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # and the update is nonzero
    old = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.abs(shards[0] - old).max() > 0
