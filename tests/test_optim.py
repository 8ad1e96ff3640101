"""Optimizer chain: schedule semantics + the bf16-moments Adam variant.

Reference optimizer: ``src/trainNetwork.py:118-130`` (Adam betas=(.9,.999),
StepLR gamma=.5). ``scale_by_adam_compact`` is a framework addition
(low-memory Adam: bf16-stored moments, f32 compute) — these tests pin
(a) exact equivalence to optax.adam when storing f32, and (b) a bounded
trajectory drift when storing bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fpsg_tpu.train.optim import make_optimizer, scale_by_adam_compact


def _tree_params(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": jax.random.normal(k1, (16, 32)) * 0.3,
        "b1": jnp.zeros((32,)),
        "w2": jax.random.normal(k2, (32, 4)) * 0.3,
        "scale": jax.random.normal(k3, (4,)) * 0.1,
    }


def _loss(params, x, y):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    pred = h @ params["w2"] * params["scale"]
    return jnp.mean((pred - y) ** 2)


def _run(tx, params, n_steps=40, seed=0):
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def step(params, opt_state, k):
        x = jax.random.normal(k, (8, 16))
        y = jnp.sin(x[:, :4])
        grads = jax.grad(_loss)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for i in range(n_steps):
        params, opt_state = step(params, opt_state, jax.random.fold_in(key, i))
    return params, opt_state


def test_f32_compact_matches_optax_adam_exactly():
    """moment_dtype=f32 makes scale_by_adam_compact == optax.scale_by_adam
    (same recurrence, same bias correction) to within one rounding."""
    params = _tree_params(jax.random.PRNGKey(0))
    ref = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(1e-3),
    )
    ours = optax.chain(
        scale_by_adam_compact(moment_dtype=jnp.float32),
        optax.scale_by_learning_rate(1e-3),
    )
    p_ref, _ = _run(ref, params)
    p_ours, _ = _run(ours, params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_ours[k]), np.asarray(p_ref[k]),
            rtol=1e-6, atol=1e-7)


def test_bf16_moments_state_dtype_and_shape():
    params = _tree_params(jax.random.PRNGKey(1))
    tx = make_optimizer(lr=1e-3, bf16_moments=True)
    st = tx.init(params)
    adam_state = st[0]  # chain: (scale_by_adam_compact, lr)
    assert isinstance(adam_state, optax.ScaleByAdamState)
    for leaf in jax.tree.leaves(adam_state.mu) + jax.tree.leaves(
            adam_state.nu):
        assert leaf.dtype == jnp.bfloat16
    # half the f32 optimizer state, byte for byte
    f32_bytes = sum(l.size * 4 for l in jax.tree.leaves(params)) * 2
    bf16_bytes = sum(
        l.size * l.dtype.itemsize
        for l in jax.tree.leaves((adam_state.mu, adam_state.nu)))
    assert bf16_bytes * 2 == f32_bytes


def test_bf16_moments_divergence_bound():
    """The documented claim: bf16-stored moments track the f32 trajectory.

    40 Adam steps on a small regression; the endpoint parameter drift vs
    f32 moments stays well under the parameter update scale (the per-step
    moment rounding is one bf16 quantization, relative ~2^-9)."""
    params = _tree_params(jax.random.PRNGKey(2))
    f32 = make_optimizer(lr=1e-3, bf16_moments=False)
    b16 = make_optimizer(lr=1e-3, bf16_moments=True)
    p_f32, _ = _run(f32, params)
    p_b16, _ = _run(b16, params)
    total_move, total_drift = 0.0, 0.0
    for k in params:
        total_move += float(jnp.sum((p_f32[k] - params[k]) ** 2))
        total_drift += float(jnp.sum((p_f32[k] - p_b16[k]) ** 2))
    rel = (total_drift / total_move) ** 0.5
    assert rel < 0.05, f"bf16-moment drift {rel:.3%} of the update norm"
    # and it actually optimizes: both land at (near-)equal loss
    x = jax.random.normal(jax.random.PRNGKey(9), (64, 16))
    y = jnp.sin(x[:, :4])
    l32, l16 = float(_loss(p_f32, x, y)), float(_loss(p_b16, x, y))
    assert abs(l16 - l32) < 0.05 * max(l32, 1e-3)


@pytest.mark.parametrize("bf16", [False, True])
def test_make_optimizer_runs_with_frozen_mask(bf16):
    params = _tree_params(jax.random.PRNGKey(3))
    mask = jax.tree.map(lambda _: False, params)
    mask["w1"] = True
    tx = make_optimizer(lr=1e-3, bf16_moments=bf16, frozen_mask=mask)
    p2, _ = _run(tx, params, n_steps=5)
    np.testing.assert_array_equal(np.asarray(p2["w1"]),
                                  np.asarray(params["w1"]))
    assert float(jnp.max(jnp.abs(p2["w2"] - params["w2"]))) > 0
