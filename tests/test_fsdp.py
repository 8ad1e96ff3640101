"""FSDP/ZeRO state sharding: params + Adam moments sharded over 'dp'.

The reference is single-GPU (no analog); this is the TPU-idiomatic
scaling mode — GSPMD derives the all-gather / reduce-scatter /
shard-local-Adam pattern from NamedSharding annotations alone
(parallel/mesh.py:fsdp_state_sharding). These tests pin, on the 8-device
CPU mesh:

1. numerical equivalence with the unsharded single-device step,
2. that large leaves actually live dp-sharded (per-device shard shapes),
3. that the step PRESERVES the sharding (out_shardings pin — without it
   the partitioner may replicate the updated state and the memory win
   silently evaporates).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from fpsg_tpu.parallel import fsdp_state_sharding, make_mesh, shard_train_state
from fpsg_tpu.train import make_train_step
from test_train_step import build


def _fsdp_setup(n_episodes=8, sgd=False):
    mesh = make_mesh(dp=8, mp=1)
    model, corpus, state, _, tx = build(n_episodes=n_episodes, sgd=sgd)
    shardings = fsdp_state_sharding(state, mesh, min_size=1024)
    sharded = shard_train_state(state, mesh, fsdp=True)
    # shard_train_state(fsdp=True) must place exactly per the rules tree
    sharded = jax.device_put(sharded, shardings)  # no-op if already placed
    step = make_train_step(model, tx, n_support=3, n_query=1,
                           n_episodes=n_episodes, donate=False, mesh=mesh,
                           state_shardings=shardings)
    return mesh, model, corpus, state, sharded, shardings, step, tx


def test_fsdp_rules_shard_large_leaves_only():
    mesh = make_mesh(dp=8, mp=1)
    _, _, state, _, _ = build(n_episodes=1)
    tree = fsdp_state_sharding(state, mesh, min_size=1024)
    n_sharded = 0
    for leaf, sh in zip(jax.tree.leaves(state), jax.tree.leaves(
            tree, is_leaf=lambda x: isinstance(x, NamedSharding))):
        assert isinstance(sh, NamedSharding)
        if sh.spec != P():
            n_sharded += 1
            ax = [i for i, s in enumerate(sh.spec) if s == "dp"]
            assert len(ax) == 1 and leaf.shape[ax[0]] % 8 == 0
            assert leaf.size >= 1024
    assert n_sharded > 0, "no leaf was sharded — rules are dead"


def test_fsdp_step_matches_unsharded():
    """dp=8 FSDP step == single-device step, same keys (the sharding is
    an execution detail, not a semantics change).

    SGD for the parity check, like test_dp_sharded_step_matches_single_
    device: Adam's first step is ±lr·sign(grad), so the reduce-scatter's
    different f32 summation order on numerically-zero gradients would
    amplify rounding noise to 2·lr sign flips."""
    mesh, model, corpus, state, sharded, shardings, step, tx = _fsdp_setup(
        sgd=True)
    ref_step = make_train_step(model, tx, n_support=3, n_query=1,
                               n_episodes=8, donate=False)
    key = jax.random.PRNGKey(7)
    ref_state, ref_m = ref_step(state, corpus, key)
    new_state, m = step(sharded, corpus, key)
    np.testing.assert_allclose(
        np.asarray(m["query_rec_loss"]),
        np.asarray(ref_m["query_rec_loss"]), rtol=2e-3)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_fsdp_composes_with_steps_per_call():
    """FSDP sharding pins survive the lax.scan multi-step dispatch (the
    production steps_per_call mode)."""
    mesh = make_mesh(dp=8, mp=1)
    model, corpus, state, _, tx = build(n_episodes=8)
    shardings = fsdp_state_sharding(state, mesh, min_size=1024)
    sharded = jax.device_put(state, shardings)
    step = make_train_step(model, tx, n_support=3, n_query=1,
                           n_episodes=8, donate=False, mesh=mesh,
                           state_shardings=shardings, steps_per_call=2)
    st, m = step(sharded, corpus, jax.random.PRNGKey(0))
    assert m["query_rec_loss"].shape == (2, 8)  # (K, E)
    assert int(st.step) == 2
    big = [l for l in jax.tree.leaves(st.params) if l.size >= 1024]
    assert any(l.addressable_shards[0].data.shape != l.shape for l in big)


def test_fsdp_state_stays_sharded_across_steps():
    mesh, model, corpus, state, sharded, shardings, step, tx = _fsdp_setup()
    st = sharded
    for i in range(2):
        st, _ = step(st, corpus, jax.random.PRNGKey(i))
    n_checked = 0
    for leaf, sh in zip(
            jax.tree.leaves(st),
            jax.tree.leaves(shardings,
                            is_leaf=lambda x: isinstance(x, NamedSharding))):
        if sh.spec == P():
            continue
        ax = [i for i, s in enumerate(sh.spec) if s == "dp"][0]
        shard_shape = leaf.addressable_shards[0].data.shape
        assert shard_shape[ax] == leaf.shape[ax] // 8, (
            leaf.shape, shard_shape)
        n_checked += 1
    assert n_checked > 0
    # and the moments are among the sharded leaves (the ZeRO point)
    mu_leaves = jax.tree.leaves(st.opt_state[0].mu)
    big = [l for l in mu_leaves if l.size >= 1024]
    assert any(
        l.addressable_shards[0].data.shape != l.shape for l in big
    ), "no Adam moment is sharded"
