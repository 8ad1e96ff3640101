"""Fused Pallas node-chain (nn/fused_stack.py) == unfused XLA decoder.

The fused path must be a pure execution-strategy change: same params,
same outputs, same running-stat updates, same gradients — in train and
eval mode, including the B=1 query-decode case whose conditioning offset
is the reason node_bn1 keeps two-pass variance (DESIGN.md §8). Runs the
kernels in interpreter mode on CPU (ops/_pallas_utils.interpret_default).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.nn import PrimitiveDecoder


def _decoders(**kw):
    base = dict(num_clusters=2, num_nodes=2, num_points=64,
                bottleneck_size=64, **kw)
    return (PrimitiveDecoder(fused="off", **base),
            PrimitiveDecoder(fused="on", **base))


def _tpl_key():
    return {"template": jax.random.PRNGKey(7)}


@pytest.mark.parametrize("batch", [3, 1])
def test_fused_forward_and_stats_match(rng, batch):
    unfused, fused = _decoders()
    h = jnp.array(rng.standard_normal((batch, 64)), jnp.float32) * 2.0
    variables = unfused.init(
        {"params": jax.random.PRNGKey(0), **_tpl_key()}, h, True
    )
    outs = {}
    for name, mod in [("unfused", unfused), ("fused", fused)]:
        y, mut = mod.apply(variables, h, True, mutable=["batch_stats"],
                           rngs=_tpl_key())
        outs[name] = (np.asarray(y), mut["batch_stats"])
    np.testing.assert_allclose(outs["fused"][0], outs["unfused"][0],
                               rtol=1e-4, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=1e-4, atol=1e-5),
        outs["fused"][1], outs["unfused"][1],
    )


def test_fused_eval_matches(rng):
    unfused, fused = _decoders()
    h = jnp.array(rng.standard_normal((2, 64)), jnp.float32)
    variables = unfused.init(
        {"params": jax.random.PRNGKey(0), **_tpl_key()}, h, True
    )
    # run a train step first so running stats are non-trivial
    _, mut = unfused.apply(variables, h, True, mutable=["batch_stats"],
                           rngs=_tpl_key())
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    ye_u = unfused.apply(variables, h, False, rngs=_tpl_key())
    ye_f = fused.apply(variables, h, False, rngs=_tpl_key())
    np.testing.assert_allclose(np.asarray(ye_f), np.asarray(ye_u),
                               rtol=1e-4, atol=1e-5)


def test_fused_gradients_match(rng):
    unfused, fused = _decoders()
    h = jnp.array(rng.standard_normal((3, 64)), jnp.float32)
    variables = unfused.init(
        {"params": jax.random.PRNGKey(0), **_tpl_key()}, h, True
    )
    tgt = jnp.array(rng.standard_normal((3, 64, 3)), jnp.float32)

    def loss(mod, p):
        y, _ = mod.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            h, True, mutable=["batch_stats"], rngs=_tpl_key(),
        )
        return jnp.mean((y - tgt) ** 2)

    g_u = jax.grad(lambda p: loss(unfused, p))(variables["params"])
    g_f = jax.grad(lambda p: loss(fused, p))(variables["params"])
    flat_u, tree_u = jax.tree.flatten(g_u)
    flat_f, _ = jax.tree.flatten(g_f)
    for a, b, path in zip(flat_f, flat_u, jax.tree.leaves(
            jax.tree.map_with_path(lambda p, _: str(p), g_u))):
        scale = max(1e-6, float(np.abs(b).max()))
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=2e-4 * scale,
            err_msg=path,
        )


def test_fused_bf16_close(rng):
    """bf16 compute: the fused path is as close to the f32 reference as
    the unfused bf16 path is. (Direct fused-vs-unfused bf16 comparison is
    not meaningful at tiny test dims: rounding points differ — the fused
    kernel adds the conditioning in f32 before one output rounding — and
    BatchNorm amplifies bf16-level input noise by rsqrt(var).)"""
    unfused32, _ = _decoders()
    unfused, fused = _decoders(dtype=jnp.bfloat16)
    h = jnp.array(rng.standard_normal((2, 64)), jnp.float32)
    variables = unfused32.init(
        {"params": jax.random.PRNGKey(0), **_tpl_key()}, h, True
    )
    ref, _ = unfused32.apply(variables, h, True, mutable=["batch_stats"],
                             rngs=_tpl_key())
    y_u, _ = unfused.apply(variables, h, True, mutable=["batch_stats"],
                           rngs=_tpl_key())
    y_f, _ = fused.apply(variables, h, True, mutable=["batch_stats"],
                         rngs=_tpl_key())
    err_u = float(np.abs(np.asarray(y_u) - np.asarray(ref)).max())
    err_f = float(np.abs(np.asarray(y_f) - np.asarray(ref)).max())
    # same ballpark of bf16-rounding error as the reference strategy
    assert err_f < max(3.0 * err_u, 0.05), (err_f, err_u)
