"""Pipeline parallelism on the REAL flagship stage split.

Round-3 pp evidence used toy stage chains; this runs the actual
VGG16-bn image branch — the flagship's deepest sequential chain —
through ``parallel/pp.py`` split at its natural block boundaries
(``VGG16BN(stage_slice=...)``: each stage owns a contiguous VGG16_CFG
range, with GLOBAL torchvision layer names so a stage's params are
literally the full model's params filtered to its range), and asserts
forward AND parameter-gradient equivalence against the unsplit model.

The microbatch is an episode's image batch: the model's BN semantics
are per-episode (protonet.py module docstring), so GPipe's
one-microbatch-at-a-time stage execution computes exactly the
sequential model's statistics — no BN-parity caveat.

The decoder is NOT pp-split by design: its parallel axis is the
cluster dimension, already covered by the 'mp' axis (parallel/mesh.py)
— pipelining it would shard the same work a second way.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fpsg_tpu.nn.vgg import VGG16BN, VGG16_CFG
from fpsg_tpu.parallel.pp import pipeline_stages

# block boundaries in cfg positions: [64,64,M | 128,128,M] [256x3,M]
# [512x3,M] [512x3,M + head]
STAGE_SLICES = [(0, 6), (6, 10), (10, 14), (14, 18)]
N_MICRO, B, IMG = 5, 2, 32


def _feature_range(lo, hi):
    start = sum(1 if e == "M" else 3 for e in VGG16_CFG[:lo])
    end = sum(1 if e == "M" else 3 for e in VGG16_CFG[:hi])
    return start, end


def _filter(tree, lo, hi):
    start, end = _feature_range(lo, hi)
    return {k: v for k, v in tree.items()
            if start <= int(k.split("_")[1]) < end}


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    return Mesh(np.array(devs[:4]), ("pp",))


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((N_MICRO, B, IMG, IMG, 3)), jnp.float32)
    # precise_stats: the default single-read BN statistics amplify
    # reassociation differences to the documented ~1e-3-of-max gradient
    # noise (PARITY.md round-2); two-pass stats keep the pp-vs-
    # sequential comparison in the reassociation band proper
    full = VGG16BN(precise_stats=True)
    variables = full.init(jax.random.PRNGKey(0), x[0], True)
    return full, variables, x


def _stage_fns():
    fns = []
    for sl in STAGE_SLICES:
        stage_mod = VGG16BN(stage_slice=sl, precise_stats=True)

        def fn(pv, a, _m=stage_mod):
            out, _ = _m.apply(pv, a, True, mutable=["batch_stats"])
            return out

        fns.append(fn)
    return fns


def _stage_params(variables):
    return tuple(
        {"params": _filter(variables["params"], lo, hi),
         "batch_stats": _filter(variables["batch_stats"], lo, hi)}
        for lo, hi in STAGE_SLICES)


def _seq_apply(full, variables, x):
    outs = [full.apply(variables, x[i], True,
                       mutable=["batch_stats"])[0]
            for i in range(x.shape[0])]
    return jnp.stack(outs)


def test_stage_slices_tile_the_network(setup):
    """The split covers every layer exactly once and each stage's param
    tree is non-empty."""
    _full, variables, _x = setup
    seen = set()
    for lo, hi in STAGE_SLICES:
        sub = _filter(variables["params"], lo, hi)
        assert sub, (lo, hi)
        ids = {int(k.split("_")[1]) for k in sub}
        assert not ids & seen
        seen |= ids
    all_ids = {int(k.split("_")[1]) for k in variables["params"]}
    assert seen == all_ids


def test_pp_forward_matches_sequential(mesh, setup):
    full, variables, x = setup
    ref = _seq_apply(full, variables, x)           # (n_micro, B, 512)
    run = pipeline_stages(_stage_fns(), mesh)
    got = run(_stage_params(variables), x)
    assert got.shape == ref.shape
    # measured: 0.2% of elements drift ~6e-5 absolute from the padded
    # boundary buffers' different fusion; pure reassociation
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=1e-4)


def test_pp_param_grads_match_sequential(mesh, setup):
    full, variables, x = setup
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (N_MICRO, B, 512)), jnp.float32)

    def loss_ref(params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        return jnp.sum(_seq_apply(full, v, x) * w)

    run = pipeline_stages(_stage_fns(), mesh)

    def loss_pp(params):
        pv = tuple(
            {"params": _filter(params, lo, hi),
             "batch_stats": _filter(variables["batch_stats"], lo, hi)}
            for lo, hi in STAGE_SLICES)
        return jnp.sum(run(pv, x) * w)

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_pp = jax.grad(loss_pp)(variables["params"])
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-8)
        d = float(jnp.max(jnp.abs(np.asarray(b) - np.asarray(a))))
        # backprop through 13 conv+BN layers amplifies the boundary-
        # buffer reassociation; the bug class this guards (a stage
        # applying the wrong params / dropping a microbatch) shows at
        # O(1) relative
        assert d <= 5e-3 * scale, (
            f"pp grad mismatch at {jax.tree_util.keystr(path)}: "
            f"{d:.3e} vs scale {scale:.3e}")


def test_stage_slice_composition_matches_full(setup):
    """The stage_slice mechanism itself, without the pipeline: chaining
    the four staged applies sequentially reproduces the full model
    (pins the global-index naming + boundary handling)."""
    full, variables, x = setup
    a = x[0]
    for sl, fn in zip(STAGE_SLICES, _stage_fns()):
        lo, hi = sl
        a = fn({"params": _filter(variables["params"], lo, hi),
                "batch_stats": _filter(variables["batch_stats"], lo, hi)},
               a)
    ref = full.apply(variables, x[0], True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
