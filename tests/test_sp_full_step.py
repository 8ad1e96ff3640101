"""FULL-model point-axis (sp) sharding: ImgPCProtoNet.loss under
shard_map with every cloud's point dim sharded.

Round-3 sp evidence stopped at the encoder + ring chamfer; this wires
``point_axis_name`` through the WHOLE training objective — PointNet
(point-dim BN stat psums + pool pmax), decoder (every BN reduces over
P, so the sp axis joins all its stat psums; each device generates its
num_points/sp template shard), ring chamfer reconstruction — and pins
it against the unsharded model: loss values and parameter gradients.

Tolerances are the established f32 psum-reassociation band
(tests/test_sp_sharding.py: the sharded program reorders BN-moment
summations; the semantic bug class these tests catch — running-var n
inflation, missing stat psum, double-counted points — shows at 1e-2
relative). ``benchmarks/sp_full_step.py`` runs the same composition at
N=16384 (the scale that motivates sp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from fpsg_tpu.models import ImgPCProtoNet

# Smallest shapes that still pin the sp failure modes (VERDICT r4 item
# 6: the round-4 AD-misroute repro was B=2, n=128 — tiny shapes find
# these; running-var n inflation / missing stat psums / double-counted
# points are all O(1) at any N). The N=16384 scale demo lives in
# benchmarks/sp_full_step.py, not here. NPTS=1024 tripled the wall time
# for zero extra coverage.
S, Q, IMG, NPTS = 4, 2, 16, 256
C, NN_ = 2, 2
PPN = NPTS // C // NN_
SP = 4  # sp bugs are sp>=2; the 8-wide mesh is covered by
        # dryrun_multichip's sp legs (trace/execute is O(SP) here)


def _mesh():
    devs = jax.devices()
    if len(devs) < SP:
        pytest.skip(f"needs {SP} devices")
    return Mesh(np.array(devs[:SP]), ("sp",))


def _episode(rng):
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    sample = {
        "xs": f32(S, IMG, IMG, 3),
        "xq": f32(Q, IMG, IMG, 3),
        "xad": f32(S, IMG, IMG, 3),
        "pcs": f32(S, NPTS, 3) * 0.3,
        "pcq": f32(Q, NPTS, 3) * 0.3,
        "pcad": f32(S, NPTS, 3) * 0.3,
    }
    tp = {
        "query": rng.uniform(0, 1, (Q, C, NN_, PPN, 2)).astype(np.float32),
        "support": rng.uniform(0, 1, (S, C, NN_, PPN, 2)).astype(np.float32),
    }
    return sample, tp


def _models():
    kw = dict(img_backbone="tiny", pc_backbone="pointnet",
              num_clusters=C, num_nodes=NN_, num_points=NPTS,
              bottleneck_size=288, intra_support=True, precise_stats=True)
    return (ImgPCProtoNet(**kw),
            ImgPCProtoNet(point_axis_name="sp", **kw))


_SAMPLE_SPECS = {
    "xs": P(), "xq": P(), "xad": P(),              # images replicated
    "pcs": P(None, "sp", None), "pcq": P(None, "sp", None),
    "pcad": P(None, "sp", None),                   # clouds point-sharded
}
_TP_SPECS = {"query": P(None, None, None, "sp", None),
             "support": P(None, None, None, "sp", None)}


def _sp_loss_fn(model_sp, mesh):
    def inner(variables, sample, tp):
        out, mut = model_sp.apply(
            variables, sample, True, tp, method="loss",
            mutable=["batch_stats"])
        return out["ttl_loss"], (out, mut["batch_stats"])

    return shard_map(
        inner, mesh=mesh,
        in_specs=(P(), _SAMPLE_SPECS, _TP_SPECS),
        out_specs=(P(), (P(), P())), check_vma=False)


def test_full_model_sp_matches_unsharded():
    mesh = _mesh()
    rng = np.random.default_rng(3)
    sample, tp = _episode(rng)
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    jtp = {k: jnp.asarray(v) for k, v in tp.items()}

    model, model_sp = _models()
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "template": jax.random.PRNGKey(1)}, jb, True)

    ref, ref_mut = model.apply(
        variables, jb, True, jtp, method="loss", mutable=["batch_stats"])
    got_loss, (got, got_stats) = _sp_loss_fn(model_sp, mesh)(
        variables, jb, jtp)

    for key in ("ttl_loss", "query_rec_loss", "support_rec_loss"):
        np.testing.assert_allclose(
            float(got[key]), float(ref[key]), rtol=5e-3,
            err_msg=f"sp loss mismatch: {key}")
    # running stats: same psum-band closeness as the encoder-level test
    for a, b in zip(jax.tree.leaves(ref_mut["batch_stats"]),
                    jax.tree.leaves(got_stats)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-3)


def test_full_model_sp_param_grads_match_unsharded():
    mesh = _mesh()
    rng = np.random.default_rng(4)
    sample, tp = _episode(rng)
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    jtp = {k: jnp.asarray(v) for k, v in tp.items()}

    model, model_sp = _models()
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "template": jax.random.PRNGKey(1)}, jb, True)
    bs = variables["batch_stats"]

    def loss_ref(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": bs}, jb, True, jtp,
            method="loss", mutable=["batch_stats"])
        return out["ttl_loss"]

    sp_fn = _sp_loss_fn(model_sp, mesh)

    def loss_sp(p):
        loss, _ = sp_fn({"params": p, "batch_stats": bs}, jb, jtp)
        return loss

    g_ref = jax.grad(loss_ref)(variables["params"])
    g_sp = jax.grad(loss_sp)(variables["params"])
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_sp = jax.tree.leaves(g_sp)
    assert len(flat_ref) == len(flat_sp)
    # near-zero-gradient leaves (pre-BN biases: analytically zero;
    # pre-pool BN biases: ~1e-6 of the largest grads) carry only float
    # noise on both sides — floor each leaf's scale at 1e-4 of the
    # global max so noise-vs-noise is not compared at relative scale
    gmax = max(float(jnp.max(jnp.abs(a))) for _, a in flat_ref)
    # 5e-2 band: at NPTS=256 each point carries 4x the chamfer weight of
    # the old 1024-point shape, so sharded-vs-unsharded argmin tie flips
    # (reduction-order dependent) move decoder grads up to ~3e-2 of
    # scale (measured round-5: deformer_conv1 2.3e-3 on a 7.8e-2-scale
    # leaf). The semantic bug classes this test pins (missing stat psum,
    # double-counted points, running-var n inflation) all show at O(1).
    for (path, a), b in zip(flat_ref, flat_sp):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-4 * gmax)
        d = float(jnp.max(jnp.abs(np.asarray(b) - np.asarray(a))))
        assert d <= 5e-2 * scale, (
            f"sp grad mismatch at {jax.tree_util.keystr(path)}: "
            f"{d:.3e} vs scale {scale:.3e}")


def test_sp_template_shards_are_distinct():
    """Without explicit template_points the decoder folds the device
    index into the template key — each device must generate a DIFFERENT
    shard of template points (a replicated draw would collapse all
    num_points into sp copies of the same num_points/sp cloud)."""
    mesh = _mesh()
    rng = np.random.default_rng(5)
    sample, _ = _episode(rng)
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    # init via the axis-free twin: the sp model's collectives only bind
    # inside shard_map (established pattern, benchmarks/sp_scaling.py)
    model0, model_sp = _models()
    variables = model0.init(
        {"params": jax.random.PRNGKey(0),
         "template": jax.random.PRNGKey(1)}, jb, True)

    def gen(variables, sample):
        out, _ = model_sp.apply(
            variables, sample, True, method="loss",
            rngs={"template": jax.random.PRNGKey(7)},
            mutable=["batch_stats"])
        return out["ttl_loss"]

    loss = shard_map(
        gen, mesh=mesh, in_specs=(P(), _SAMPLE_SPECS),
        out_specs=P(), check_vma=False)(variables, jb)
    assert np.isfinite(float(loss))

    # direct witness on the decoder: distinct per-device template draws
    from fpsg_tpu.nn.decoder import PrimitiveDecoder

    dec_kw = dict(num_clusters=C, num_nodes=NN_, num_points=NPTS,
                  bottleneck_size=288)
    dec = PrimitiveDecoder(point_axis_name="sp", **dec_kw)
    dec0 = PrimitiveDecoder(**dec_kw)  # axis-free init twin
    h = jnp.asarray(rng.standard_normal((2, 288 + 3)), jnp.float32)
    dvars = dec0.init({"params": jax.random.PRNGKey(0),
                       "template": jax.random.PRNGKey(1)},
                      h, True, jnp.zeros((2, C, NN_, PPN // SP, 2)))

    def run(dvars, h):
        out, _ = dec.apply(dvars, h, True, None,
                           rngs={"template": jax.random.PRNGKey(7)},
                           mutable=["batch_stats"])
        return out

    syn = shard_map(
        run, mesh=mesh, in_specs=(P(), P()),
        out_specs=P(None, "sp", None), check_vma=False)(dvars, h)
    assert syn.shape == (2, NPTS, 3)
    shards = np.asarray(syn).reshape(2, SP, NPTS // SP, 3)
    for i in range(1, SP):
        assert np.abs(shards[:, i] - shards[:, 0]).max() > 1e-4, (
            f"device {i} generated the same points as device 0 — "
            "template fold_in not applied")
