"""Goldens whose oracle is the REFERENCE'S OWN SOURCE, not a replica.

Every other golden in this suite compares against a torch replica
written inside the test — a replica can share a misreading with the
implementation. This file imports ``/root/reference/src/pointnet/model.py``
directly (it is CPU-safe: no ``.cuda()`` at import or in forward on CPU
tensors), syncs weights through ``fpsg_tpu.io.convert``, and compares
outputs, gradients, and running-stat updates of ``nn/pointnet.py``
against the reference's executed code.

Covered branches (all executed, none replicated):

- PointNet/STN (``src/pointnet/model.py:11-135, 199-305``) — CPU-safe,
  imported directly.
- DGCNN (``src/dgcnn/model.py:23-88``) — its only CUDA dependency is
  ``torch.device('cuda')`` INSIDE ``get_graph_feature`` (model.py:29),
  patched to CPU for the duration of each forward/backward. (An earlier
  revision of this file wrongly claimed the module could not execute on
  CPU; VERDICT r4 item 3 corrected that.)
- The loss composition itself (``src/models/few_shot.py:63-129``) —
  imported with ``sys.modules`` stubs for kaolin / neuralnet_pytorch /
  pymesh (not installed here; the chamfer stub implements the already-
  pinned Kaolin 0.9 convention) and a ``Tensor.cuda`` no-op shim for the
  module-level ``_ZERO_HOLDER`` (few_shot.py:15), then driven with the
  weight-synced torch replica encoders as its submodules. The reference's
  OWN composition code — corpus concat order, prototype mean, decoder
  conditioning, loss factors — is the oracle.
"""

import importlib
import importlib.util
import os
import sys
import types
from unittest import mock

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from fpsg_tpu.nn.pointnet import STN3d, PointNetFeat

REF = "/root/reference/src/pointnet/model.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not present")


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("ref_pointnet_model", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load_reference_module()


def _randomize(tmodel, rng):
    """Fill every parameter and running stat with non-trivial values so
    eval-mode BN and the affine transforms are all exercised (default
    init leaves BN scale=1, bias=0, mean=0, var=1 — too easy)."""
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.from_numpy(
                (rng.standard_normal(tuple(p.shape)) * 0.2)
                .astype(np.float32)))
        for name, b in tmodel.named_buffers():
            if b.dtype not in (torch.float32, torch.float64):
                continue  # num_batches_tracked
            if name.endswith("running_var"):
                b.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, tuple(b.shape))
                    .astype(np.float32)))
            else:
                b.copy_(torch.from_numpy(
                    (rng.standard_normal(tuple(b.shape)) * 0.3)
                    .astype(np.float32)))


def _to_flax(tmodel):
    from fpsg_tpu.io.convert import torch_state_dict_to_flax

    # .copy() is load-bearing: jnp.asarray on CPU can alias the numpy
    # buffer, which SHARES memory with the torch tensor — torch's
    # in-place running-stat updates would silently mutate the converted
    # "snapshot" (observed: running-stat parity false-failed this way).
    sd = {k: v.detach().numpy().copy()
          for k, v in tmodel.state_dict().items()}
    return torch_state_dict_to_flax(sd)


def _grad_tree(tmodel):
    """torch param grads -> a flax-shaped nested tree (params only)."""
    buffers = dict(tmodel.named_buffers())
    out = {}
    for name, p in tmodel.named_parameters():
        *mod, leaf = name.split(".")
        is_bn = ".".join(mod + ["running_mean"]) in buffers
        g = p.grad.detach().numpy()
        if leaf == "weight":
            if is_bn:
                leaf = "scale"
            elif g.ndim == 3:
                g, leaf = g[:, :, 0].T, "kernel"
            elif g.ndim == 2:
                g, leaf = g.T, "kernel"
        node = out
        for m in mod:
            node = node.setdefault(m, {})
        node[leaf] = g
    return out


def _assert_trees_close(a, b, rtol, atol, path=""):
    """Leaf-scale-aware closeness: |a-b| <= rtol*max|b| + atol per leaf.

    Per-ELEMENT rtol is the wrong shape for gradients — a leaf whose
    largest entries are O(100) legitimately carries O(100*eps)
    cancellation noise on its near-zero entries."""
    assert set(a) == set(b), f"{path}: {set(a)} != {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_trees_close(a[k], b[k], rtol, atol, f"{path}/{k}")
        else:
            aa, bb = np.asarray(a[k]), np.asarray(b[k])
            tol = rtol * np.abs(bb).max() + atol
            d = np.abs(aa - bb).max()
            assert d <= tol, (
                f"{path}/{k}: max|diff| {d:.3e} > {tol:.3e} "
                f"(leaf scale {np.abs(bb).max():.3e})")


def test_stn3d_matches_reference_source(ref, rng):
    tm = ref.STN3d()
    _randomize(tm, rng)
    variables = _to_flax(tm)
    x = rng.standard_normal((4, 128, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 2, 1)  # reference is (B, 3, N)

    tm.eval()
    with torch.no_grad():
        ev_t = tm(xt).numpy()
    ev_j = STN3d(precise_stats=True).apply(
        variables, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(ev_j), ev_t,
                               rtol=1e-4, atol=1e-5)

    tm.train()
    tr_t = tm(xt).detach().numpy()
    tr_j, _ = STN3d(precise_stats=True).apply(
        variables, jnp.asarray(x), True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(tr_j), tr_t,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("feature_transform", [False, True])
def test_pointnetfeat_global_matches_reference_source(
        ref, rng, feature_transform):
    tm = ref.PointNetfeat(global_feat=True,
                          feature_transform=feature_transform)
    _randomize(tm, rng)
    variables = _to_flax(tm)
    x = rng.standard_normal((4, 128, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 2, 1)

    model = PointNetFeat(feature_transform=feature_transform,
                         precise_stats=True)
    tm.eval()
    with torch.no_grad():
        feat_t, trans_t, tf_t = tm(xt)
    feat_j, trans_j, tf_j = model.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(feat_j), feat_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(trans_j), trans_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    if feature_transform:
        np.testing.assert_allclose(np.asarray(tf_j), tf_t.numpy(),
                                   rtol=1e-4, atol=1e-5)


def _grads(ref, rng, feature_transform):
    tm = ref.PointNetfeat(global_feat=True,
                          feature_transform=feature_transform)
    _randomize(tm, rng)
    variables = _to_flax(tm)
    x = rng.standard_normal((4, 64, 3)).astype(np.float32)
    w = rng.standard_normal((4, 1024)).astype(np.float32)  # loss weights

    tm.train()
    xt = torch.from_numpy(x).permute(0, 2, 1).requires_grad_(True)
    feat_t, _, _ = tm(xt)
    (feat_t * torch.from_numpy(w)).sum().backward()
    gx_t = xt.grad.permute(0, 2, 1).numpy()

    model = PointNetFeat(feature_transform=feature_transform,
                         precise_stats=True)

    def loss(params, xin):
        (feat, _, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xin, True, mutable=["batch_stats"])
        return (feat * w).sum()

    gp_j, gx_j = jax.grad(loss, argnums=(0, 1))(
        variables["params"], jnp.asarray(x))
    return tm, np.asarray(gx_j), gx_t, jax.tree.map(np.asarray, gp_j)


def test_pointnetfeat_grads_match_reference_source(ref, rng):
    """Train-mode loss gradients — wrt the INPUT and EVERY parameter —
    against autograd through the reference's executed forward. A conv
    bias immediately before a train-mode BN has mathematically ZERO
    gradient (BN subtracts the batch mean), so both sides produce only
    float noise there — covered by the atol term."""
    tm, gx_j, gx_t, gp_j = _grads(ref, rng, feature_transform=False)
    np.testing.assert_allclose(gx_j, gx_t, rtol=2e-4, atol=1e-4)
    _assert_trees_close(gp_j, _grad_tree(tm), rtol=2e-4, atol=1e-4)


def test_pointnetfeat_feature_transform_grads_at_tie_floor(ref, rng):
    """With feature_transform=True the composed graph's gradient is
    intrinsically tie-sensitive: a 1e-6 input jitter moves OUR OWN
    gradient by ~1.3% (measured: relu-boundary/argmax routing flips in
    the fstn composition — same phenomenon as DESIGN.md §12.4's
    two-sided tie-sensitivity floor). Exact parity with torch is
    therefore unachievable here; assert agreement at the measured
    floor instead."""
    tm, gx_j, gx_t, gp_j = _grads(ref, rng, feature_transform=True)
    scale = np.abs(gx_t).max()
    assert np.abs(gx_j - gx_t).max() / scale < 0.05
    flat_t = jax.tree.leaves(_grad_tree(tm))
    flat_j = jax.tree.leaves(gp_j)
    # zero-grad pre-BN biases carry only float noise on both sides:
    # floor each leaf's scale at 1e-4 of the largest gradient anywhere
    gmax = max(np.abs(b).max() for b in flat_t)
    for a, b in zip(flat_j, flat_t):
        s = max(np.abs(b).max(), 1e-4 * gmax)
        assert np.abs(np.asarray(a) - b).max() / s < 0.06


def test_pointnetfeat_running_stats_track_reference_source(ref, rng):
    """Three train-mode forwards: the running mean/var evolution
    (momentum 0.1, unbiased var, torch update order) must track the
    reference's own BN buffers."""
    tm = ref.PointNetfeat(global_feat=True, feature_transform=False)
    _randomize(tm, rng)
    variables = _to_flax(tm)
    model = PointNetFeat(precise_stats=True)
    stats = variables["batch_stats"]
    tm.train()
    for i in range(3):
        x = rng.standard_normal((4, 96, 3)).astype(np.float32)
        with torch.no_grad():
            tm(torch.from_numpy(x).permute(0, 2, 1))
        _, upd = model.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), True, mutable=["batch_stats"])
        stats = upd["batch_stats"]
    ref_stats = _to_flax(tm)["batch_stats"]
    _assert_trees_close(jax.tree.map(np.asarray, stats), ref_stats,
                        rtol=1e-4, atol=1e-5)


def test_pointnetfeat_dense_matches_reference_source(ref, rng):
    """global_feat=False: the per-point [global | point] concat for
    segmentation heads (reference model.py:237-239)."""
    tm = ref.PointNetfeat(global_feat=False, feature_transform=False)
    _randomize(tm, rng)
    variables = _to_flax(tm)
    x = rng.standard_normal((2, 64, 3)).astype(np.float32)
    tm.eval()
    with torch.no_grad():
        feat_t, _, _ = tm(torch.from_numpy(x).permute(0, 2, 1))
    feat_j, _, _ = PointNetFeat(
        global_feat=False, precise_stats=True).apply(
        variables, jnp.asarray(x), False)
    # reference returns (B, 1088, N); ours (B, N, 1088)
    np.testing.assert_allclose(
        np.asarray(feat_j), feat_t.permute(0, 2, 1).numpy(),
        rtol=1e-4, atol=1e-5)


def test_feature_transform_regularizer_matches_reference_source(ref, rng):
    from fpsg_tpu.nn.pointnet_heads import feature_transform_regularizer

    trans = rng.standard_normal((6, 64, 64)).astype(np.float32)
    ours = feature_transform_regularizer(jnp.asarray(trans))
    theirs = ref.feature_transform_regularizer(
        torch.from_numpy(trans)).item()
    np.testing.assert_allclose(float(ours), theirs, rtol=1e-5)


# ---------------------------------------------------------------------------
# DGCNN: the reference's own dgcnn/model.py executed as oracle
# ---------------------------------------------------------------------------

REF_DGCNN = "/root/reference/src/dgcnn/model.py"


def _cpu_device_patch():
    """``get_graph_feature`` hardcodes ``torch.device('cuda')``
    (dgcnn/model.py:29); route every ``torch.device`` call to CPU for the
    duration of a reference forward/backward."""
    real = torch.device
    return mock.patch.object(torch, "device", lambda *a, **k: real("cpu"))


@pytest.fixture(scope="module")
def ref_dgcnn():
    spec = importlib.util.spec_from_file_location("ref_dgcnn_model",
                                                  REF_DGCNN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # import-safe: the cuda hardcode is
    return mod                    # inside get_graph_feature


def _ref_dgcnn_state_to_flax(pairs):
    """Reference ``conv{i}.{0,1}.*`` keys -> our ``conv{i}/{conv,bn}``
    tree via the SAME remap the production checkpoint ingest uses
    (io/convert.py:_map_dgcnn_keys), so this golden also exercises the
    converter path."""
    from fpsg_tpu.io.convert import _map_dgcnn_keys, torch_state_dict_to_flax

    sd = {}
    for key, val in pairs.items():
        parts = key.split(".")
        mod, leaf = tuple(parts[:-1]), parts[-1]
        v = val.detach().numpy().copy()
        if leaf == "weight" and v.ndim == 4:   # Conv2d k=1 -> Conv1d shape
            assert v.shape[-2:] == (1, 1), (key, v.shape)
            v = v[:, :, :, 0]
        sd[".".join(_map_dgcnn_keys(mod) + (leaf,))] = v
    return torch_state_dict_to_flax(sd)


def _make_dgcnn_pair(ref_dgcnn, rng, k=8):
    tm = ref_dgcnn.DGCNNfeat(embeding_dim=1024, num_neighbors=k)
    _randomize(tm, rng)
    variables = _ref_dgcnn_state_to_flax(tm.state_dict())
    from fpsg_tpu.nn.dgcnn import DGCNNFeat

    model = DGCNNFeat(k=k, precise_stats=True)
    return tm, model, variables


def test_dgcnn_matches_reference_source(ref_dgcnn, rng):
    tm, model, variables = _make_dgcnn_pair(ref_dgcnn, rng)
    x = rng.standard_normal((2, 48, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 2, 1)  # reference is (B, 3, N)

    tm.eval()
    with torch.no_grad(), _cpu_device_patch():
        ev_t = tm(xt).numpy()
    ev_j = model.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(ev_j), ev_t,
                               rtol=1e-3, atol=1e-4)

    tm.train()
    with _cpu_device_patch():
        tr_t = tm(xt).detach().numpy()
    tr_j, _ = model.apply(variables, jnp.asarray(x), True,
                          mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(tr_j), tr_t,
                               rtol=1e-3, atol=1e-4)


def test_dgcnn_grads_match_reference_source(ref_dgcnn, rng):
    """Train-mode loss gradients wrt the input and every parameter
    against autograd through the reference's executed forward. The
    gradient routes through topk neighbor selection, per-neighbor max
    routing, and leaky-relu — all index decisions must agree for these
    to match."""
    tm, model, variables = _make_dgcnn_pair(ref_dgcnn, rng)
    x = rng.standard_normal((2, 40, 3)).astype(np.float32)
    w = rng.standard_normal((2, 1024)).astype(np.float32)

    tm.train()
    xt = torch.from_numpy(x).permute(0, 2, 1).requires_grad_(True)
    with _cpu_device_patch():
        feat_t = tm(xt)
        (feat_t * torch.from_numpy(w)).sum().backward()
    gx_t = xt.grad.permute(0, 2, 1).numpy()

    def loss(params, xin):
        feat, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xin, True, mutable=["batch_stats"])
        return (feat * w).sum()

    gp_j, gx_j = jax.grad(loss, argnums=(0, 1))(
        variables["params"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gx_j), gx_t,
                               rtol=2e-4, atol=2e-4)
    # param grads through the same remap as the weights (BN buffers
    # included so the converter classifies BN weight->scale correctly)
    gp_t = _ref_dgcnn_state_to_flax({
        **{name: p.grad for name, p in tm.named_parameters()},
        **{name: b for name, b in tm.named_buffers()
           if b.dtype == torch.float32},
    })["params"]
    _assert_trees_close(jax.tree.map(np.asarray, gp_j), gp_t,
                        rtol=3e-4, atol=2e-4)


def test_dgcnn_running_stats_track_reference_source(ref_dgcnn, rng):
    tm, model, variables = _make_dgcnn_pair(ref_dgcnn, rng)
    stats = variables["batch_stats"]
    tm.train()
    for _ in range(3):
        x = rng.standard_normal((2, 44, 3)).astype(np.float32)
        with torch.no_grad(), _cpu_device_patch():
            tm(torch.from_numpy(x).permute(0, 2, 1))
        _, upd = model.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), True, mutable=["batch_stats"])
        stats = upd["batch_stats"]
    ref_stats = _ref_dgcnn_state_to_flax(tm.state_dict())["batch_stats"]
    _assert_trees_close(jax.tree.map(np.asarray, stats), ref_stats,
                        rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Loss composition: the reference's own models/few_shot.py executed as oracle
# ---------------------------------------------------------------------------

REF_FEW_SHOT_DIR = "/root/reference/src/models"


def _torch_chamfer_per_cloud(a, b):
    """Kaolin 0.9 ``chamfer_distance`` convention (pinned in round 1,
    PARITY.md §N1; ``tests/test_full_step_parity.py:torch_chamfer_sum``
    without the reference's trailing ``.sum()`` — few_shot.py:110 applies
    that itself)."""
    d = torch.cdist(a, b) ** 2
    return d.min(2).values.mean(1) + d.min(1).values.mean(1)


@pytest.fixture(scope="module")
def ref_few_shot():
    """Import the reference's models package with stubs for the CUDA-only
    native deps (kaolin chamfer = the pinned convention; emd/pymesh are
    imported but unused by ``loss``) and a ``Tensor.cuda`` no-op for the
    module-level ``_ZERO_HOLDER`` (few_shot.py:15)."""
    def m(name):
        mod = types.ModuleType(name)
        return mod

    kaolin, kmetrics, kpc = m("kaolin"), m("kaolin.metrics"), \
        m("kaolin.metrics.pointcloud")
    kpc.chamfer_distance = _torch_chamfer_per_cloud
    kaolin.metrics, kmetrics.pointcloud = kmetrics, kpc
    nnp, nnpm = m("neuralnet_pytorch"), m("neuralnet_pytorch.metrics")
    nnpm.emd_loss = None  # imported by models/utils.py, unused by loss
    nnp.metrics = nnpm
    pkg = types.ModuleType("ref_models")
    pkg.__path__ = [REF_FEW_SHOT_DIR]
    stubs = {
        "kaolin": kaolin, "kaolin.metrics": kmetrics,
        "kaolin.metrics.pointcloud": kpc,
        "neuralnet_pytorch": nnp, "neuralnet_pytorch.metrics": nnpm,
        "pymesh": m("pymesh"), "ref_models": pkg,
    }
    with mock.patch.dict(sys.modules, stubs), \
            mock.patch.object(torch.Tensor, "cuda",
                              lambda self, *a, **k: self):
        return importlib.import_module("ref_models.few_shot")


@pytest.mark.parametrize("intra_support", [True, False])
def test_loss_composition_matches_reference_source(ref_few_shot, rng,
                                                   intra_support):
    """Run the reference's OWN ``ImgPCProtoNet._loss_single_class``
    (few_shot.py:75-129) with the weight-synced torch replica encoders as
    its submodules, against our flax ``ImgPCProtoNet.loss`` on the same
    episode/weights/template draws. This replaces the in-test composition
    replica (``test_full_step_parity.run_torch_loss``) with the
    reference's executed code as the oracle for: the ad+query image
    corpus concat, the support+ad cloud corpus concat, prototype
    mean/repeat, decoder conditioning concat order, per-branch loss
    factors, and the intra_support gate."""
    import test_full_step_parity as fsp
    from fpsg_tpu.models import ImgPCProtoNet

    S, Q, IMG, NPTS = fsp.S, fsp.Q, fsp.IMG, fsp.NPTS
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    sample = {
        "xs": f32(S, IMG, IMG, 3), "xq": f32(Q, IMG, IMG, 3),
        "xad": f32(S, IMG, IMG, 3),
        "pcs": f32(S, NPTS, 3) * 0.3, "pcq": f32(Q, NPTS, 3) * 0.3,
        "pcad": f32(S, NPTS, 3) * 0.3,
    }
    raw_q = rng.uniform(0, 1, (Q, fsp.C, fsp.NN_, fsp.PPN, 2)) \
        .astype(np.float32)
    raw_s = rng.uniform(0, 1, (S, fsp.C, fsp.NN_, fsp.PPN, 2)) \
        .astype(np.float32)

    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet",
        num_clusters=fsp.C, num_nodes=fsp.NN_, num_points=NPTS,
        bottleneck_size=fsp.BOTT, intra_support=intra_support,
        precise_stats=True, query_factor=0.75, support_factor=1.5,
    )
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "template": jax.random.PRNGKey(1)}, jb, True)
    p = variables["params"]

    tm_vgg = fsp.TorchVGG()
    fsp.copy_vgg(tm_vgg, p["img_encoder"]["encoder"])
    tm_pn = fsp.TorchPointNetFeat()
    fsp.copy_pointnet(
        tm_pn,
        p["pc_encoder_wrap"]["pc_encoder"]["pointnet_feat_extractor"])
    deformers, nodes = fsp.build_torch_decoder(
        p["pc_decoder"], fsp.C, fsp.NN_, 2, fsp.W_DEF, fsp.D)

    class _ImgEnc(torch.nn.Module):
        def forward(self, x):  # reference feeds NCHW
            tm_vgg.train(self.training)
            return tm_vgg(x)

    class _PcEnc(torch.nn.Module):
        def forward(self, x):
            tm_pn.train(self.training)
            return tm_pn(x)

    class _Decoder(torch.nn.Module):
        def forward(self, h):
            raw = raw_q if h.shape[0] == Q else raw_s
            return fsp.run_torch_decoder_grad(
                deformers, nodes, h, raw, self.training)

    ref_net = ref_few_shot.ImgPCProtoNet(
        _ImgEnc(), _PcEnc(), _Decoder(), metric="cd",
        intra_support=intra_support, query_factor=0.75,
        support_factor=1.5)
    ref_net.train()
    # reference sample layout: leading n_class=1 dim, NCHW images
    tsample = {
        "xs": torch.from_numpy(sample["xs"]).permute(0, 3, 1, 2)[None],
        "xq": torch.from_numpy(sample["xq"]).permute(0, 3, 1, 2)[None],
        "xad": torch.from_numpy(sample["xad"]).permute(0, 3, 1, 2)[None],
        "pcs": torch.from_numpy(sample["pcs"])[None],
        "pcq": torch.from_numpy(sample["pcq"])[None],
        "pcad": torch.from_numpy(sample["pcad"])[None],
    }
    ans_t = ref_net.loss(tsample)

    tp = {"query": jnp.asarray(raw_q), "support": jnp.asarray(raw_s)}
    out_j, _ = model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]},
        jb, True, tp, method="loss", mutable=["batch_stats"])

    np.testing.assert_allclose(
        float(out_j["ttl_loss"]), float(ans_t["ttl_loss"].detach()),
        rtol=3e-4, err_msg="ttl_loss vs reference-executed composition")
    np.testing.assert_allclose(
        float(out_j["query_rec_loss"]),
        float(ans_t["query_rec_loss"].detach()), rtol=3e-4)
    np.testing.assert_allclose(
        float(out_j["support_rec_loss"]),
        float(ans_t["support_rec_loss"].detach()), rtol=3e-4, atol=1e-7)
    np.testing.assert_allclose(
        float(out_j["recon_loss"]),
        float(ans_t["recon_loss"].detach()), rtol=3e-4)
