"""FULL-train-step golden parity vs a weight-synced torch replica.

VERDICT r1 item 3 / the strongest dataset-free evidence for the 1%-parity
north star: ONE identical episode runs through ``ImgPCProtoNet.loss``
(train mode) in BOTH frameworks with identical weights and identical
template samples; ``ttl_loss``, the per-branch losses, a gradient sample
from every compute branch, and the eval-mode losses (post running-stat
update) must agree. Torch side is an independently-written replica of
reference ``src/models/few_shot.py:75-129`` + ``point_cloud_net.py:37-132``
+ ``pointnet/model.py:11-45,199-239`` + kaolin chamfer semantics.

Shapes are small (32x32 images, 64-point clouds, 2x2 primitives) but the
architecture is the real one: full VGG16-bn, full PointNet-with-STN3d,
bottleneck 1536 (so the node MLPs are the real 1539-wide stacks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from fpsg_tpu.models import ImgPCProtoNet
from fpsg_tpu.nn.vgg import VGG16_CFG

from test_golden_parity import TorchVGG, build_torch_decoder, t

S, Q, IMG, NPTS = 3, 1, 32, 64
C, NN_, BOTT = 2, 2, 1536
D = 3 + BOTT
PPN = NPTS // C // NN_
W_DEF = 128  # deformer width


def torch_chamfer_sum(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    """Kaolin 0.9 chamfer semantics + the reference's ``.sum()``
    (few_shot.py:110)."""
    d = torch.cdist(a, b) ** 2
    per = d.min(2).values.mean(1) + d.min(1).values.mean(1)
    return per.sum()


# ---------------------------------------------------------------------------
# Torch replicas (reference architecture, weights copied from flax)
# ---------------------------------------------------------------------------

class TorchSTN3d(tnn.Module):
    """pointnet/model.py:11-45."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv1d(3, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.fc1 = tnn.Linear(1024, 512)
        self.fc2 = tnn.Linear(512, 256)
        self.fc3 = tnn.Linear(256, 9)
        self.bn1, self.bn2, self.bn3 = (
            tnn.BatchNorm1d(64), tnn.BatchNorm1d(128), tnn.BatchNorm1d(1024))
        self.bn4, self.bn5 = tnn.BatchNorm1d(512), tnn.BatchNorm1d(256)

    def forward(self, x):  # (B, 3, N)
        b = x.shape[0]
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = F.relu(self.bn3(self.conv3(h)))
        h = h.max(2).values
        h = F.relu(self.bn4(self.fc1(h)))
        h = F.relu(self.bn5(self.fc2(h)))
        h = self.fc3(h)
        return (h + torch.eye(3).reshape(9)).reshape(b, 3, 3)


class TorchPointNetFeat(tnn.Module):
    """pointnet/model.py:199-239 (global_feat path)."""

    def __init__(self):
        super().__init__()
        self.stn = TorchSTN3d()
        self.conv1 = tnn.Conv1d(3, 64, 1)
        self.conv2 = tnn.Conv1d(64, 128, 1)
        self.conv3 = tnn.Conv1d(128, 1024, 1)
        self.bn1, self.bn2, self.bn3 = (
            tnn.BatchNorm1d(64), tnn.BatchNorm1d(128), tnn.BatchNorm1d(1024))

    def forward(self, x):  # (B, 3, N)
        trans = self.stn(x)
        x = torch.bmm(x.transpose(2, 1), trans).transpose(2, 1)
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        return x.max(2).values  # (B, 1024)


def _copy_dense_to_conv1d(conv, sub):
    with torch.no_grad():
        conv.weight.copy_(t(np.asarray(sub["kernel"]).T[:, :, None]))
        conv.bias.copy_(t(np.asarray(sub["bias"])))


def _copy_dense_to_linear(lin, sub):
    with torch.no_grad():
        lin.weight.copy_(t(np.asarray(sub["kernel"]).T))
        lin.bias.copy_(t(np.asarray(sub["bias"])))


def _copy_bn(bn, sub):
    with torch.no_grad():
        bn.weight.copy_(t(np.asarray(sub["scale"])))
        bn.bias.copy_(t(np.asarray(sub["bias"])))


def copy_pointnet(tm: TorchPointNetFeat, p):
    """p = params['pc_encoder_wrap']['pc_encoder']['pointnet_feat_extractor']"""
    stn = p["stn"]
    for name in ("conv1", "conv2", "conv3"):
        _copy_dense_to_conv1d(getattr(tm.stn, name), stn[name])
    for name in ("fc1", "fc2", "fc3"):
        _copy_dense_to_linear(getattr(tm.stn, name), stn[name])
    for i in range(1, 6):
        _copy_bn(getattr(tm.stn, f"bn{i}"), stn[f"bn{i}"])
    for name in ("conv1", "conv2", "conv3"):
        _copy_dense_to_conv1d(getattr(tm, name), p[name])
    for i in range(1, 4):
        _copy_bn(getattr(tm, f"bn{i}"), p[f"bn{i}"])


def copy_vgg(tm: TorchVGG, p):
    """p = params['img_encoder']['encoder'] (flax VGG16BN, torchvision idx)"""
    idx = 0
    for v in VGG16_CFG:
        if v == "M":
            idx += 1
            continue
        conv, bn = tm.features[idx], tm.features[idx + 1]
        k = np.asarray(p[f"features_{idx}"]["kernel"])  # HWIO
        with torch.no_grad():
            conv.weight.copy_(t(np.transpose(k, (3, 2, 0, 1))))
            conv.bias.copy_(t(np.asarray(p[f"features_{idx}"]["bias"])))
        _copy_bn(bn, p[f"features_{idx + 1}"])
        idx += 3


def run_torch_decoder_grad(deformers, nodes, h, raw, train=True):
    """Reference decoder forward (point_cloud_net.py:97-132) keeping the
    torch autograd graph intact (h: torch tensor, raw: numpy)."""
    for layers in deformers:
        for m in layers.values():
            m.train(train)
    for cl in nodes:
        for nlayers in cl:
            for m in nlayers.values():
                m.train(train)
    outs = []
    for ci in range(len(deformers)):
        dl = deformers[ci]
        for ni in range(len(nodes[0])):
            x = t(raw[:, ci, ni]).transpose(2, 1)  # (B, ori, P)
            x = F.relu(dl["bn1"](dl["conv1"](x)))
            x = F.relu(dl["bn2"](dl["conv2"](x)))
            deformed = torch.tanh(dl["conv3"](x))
            cond = h.unsqueeze(2).repeat(1, 1, deformed.shape[2])
            y = torch.cat([cond, deformed], dim=1)
            nl = nodes[ci][ni]
            y = F.relu(nl["bn1"](nl["conv1"](y)))
            y = F.relu(nl["bn2"](nl["conv2"](y)))
            y = F.relu(nl["bn3"](nl["conv3"](y)))
            outs.append(torch.tanh(nl["conv4"](y)))
    return torch.cat(outs, dim=2).transpose(1, 2)


def run_torch_loss(tm_vgg, tm_pn, deformers, nodes, sample, raw_q, raw_s,
                   train=True):
    """Reference _loss_single_class (few_shot.py:75-129), torch."""
    tm_vgg.train(train)
    tm_pn.train(train)
    xq, xad = t(sample["xq"]), t(sample["xad"])
    pcs, pcq, pcad = t(sample["pcs"]), t(sample["pcq"]), t(sample["pcad"])

    img = torch.cat([xad, xq]).permute(0, 3, 1, 2)       # NHWC → NCHW
    img_z = tm_vgg(img)                                   # (S+Q, 512)
    img_zad, img_zq = img_z[:S], img_z[S:]
    pc_z = tm_pn(torch.cat([pcs, pcad]).transpose(2, 1))  # (2S, 1024)
    proto = pc_z[:S].mean(0, keepdim=True).repeat(Q, 1)

    syn_q = run_torch_decoder_grad(
        deformers, nodes, torch.cat([img_zq, proto], 1), raw_q, train)
    loss_q = torch_chamfer_sum(syn_q, pcq)
    syn_s = run_torch_decoder_grad(
        deformers, nodes, torch.cat([img_zad, pc_z[S:]], 1), raw_s, train)
    loss_s = torch_chamfer_sum(syn_s, pcad)
    return loss_q + loss_s, loss_q, loss_s


# ---------------------------------------------------------------------------
# The test
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def episode():
    rng = np.random.default_rng(7)
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    sample = {
        "xs": f32(S, IMG, IMG, 3),
        "xq": f32(Q, IMG, IMG, 3),
        "xad": f32(S, IMG, IMG, 3),
        "pcs": (f32(S, NPTS, 3) * 0.3),
        "pcq": (f32(Q, NPTS, 3) * 0.3),
        "pcad": (f32(S, NPTS, 3) * 0.3),
    }
    raw_q = rng.uniform(0, 1, (Q, C, NN_, PPN, 2)).astype(np.float32)
    raw_s = rng.uniform(0, 1, (S, C, NN_, PPN, 2)).astype(np.float32)
    return sample, raw_q, raw_s


@pytest.fixture(scope="module")
def models(episode):
    sample, raw_q, raw_s = episode
    # precise_stats: two-pass BN variance — the exact-semantics mode the
    # tight gradient assertions run against (the default single-read stat
    # mode drifts ~1e-7 in the statistics, which relu-boundary flips
    # amplify to ~1e-3-of-max gradient noise over the 13-conv chain; it is
    # covered by the loss-level test below).
    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet",
        num_clusters=C, num_nodes=NN_, num_points=NPTS,
        bottleneck_size=BOTT, intra_support=True, precise_stats=True,
    )
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "template": jax.random.PRNGKey(1)},
        jb, True,
    )
    p = variables["params"]
    tm_vgg = TorchVGG()
    copy_vgg(tm_vgg, p["img_encoder"]["encoder"])
    tm_pn = TorchPointNetFeat()
    copy_pointnet(
        tm_pn, p["pc_encoder_wrap"]["pc_encoder"]["pointnet_feat_extractor"])
    deformers, nodes = build_torch_decoder(
        p["pc_decoder"], C, NN_, 2, W_DEF, D)
    return model, variables, tm_vgg, tm_pn, deformers, nodes


def test_full_step_loss_and_grads_match_torch(episode, models):
    sample, raw_q, raw_s = episode
    model, variables, tm_vgg, tm_pn, deformers, nodes = models
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    tp = {"query": jnp.asarray(raw_q), "support": jnp.asarray(raw_s)}

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jb, True, tp, method="loss", mutable=["batch_stats"],
        )
        return out["ttl_loss"], (out, mut["batch_stats"])

    (ttl_j, (out_j, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])

    ttl_t, loss_q_t, loss_s_t = run_torch_loss(
        tm_vgg, tm_pn, deformers, nodes, sample, raw_q, raw_s, train=True)
    ttl_t.backward()

    # --- losses (train mode, batch statistics) ---------------------------
    # Measured agreement ~1.4e-5 rel (f32); 3e-4 gives platform margin.
    np.testing.assert_allclose(
        float(ttl_j), float(ttl_t.detach()), rtol=3e-4,
        err_msg="ttl_loss train-mode mismatch")
    np.testing.assert_allclose(
        float(out_j["query_rec_loss"]), float(loss_q_t.detach()), rtol=3e-4)
    np.testing.assert_allclose(
        float(out_j["support_rec_loss"]), float(loss_s_t.detach()), rtol=3e-4)

    # --- gradient sample: one tensor from every compute branch -----------
    g = grads
    checks = [
        # VGG first conv (HWIO vs OIHW)
        (np.transpose(
            np.asarray(g["img_encoder"]["encoder"]["features_0"]["kernel"]),
            (3, 2, 0, 1)),
         tm_vgg.features[0].weight.grad.numpy(), "vgg features_0"),
        # PointNet conv1 (Dense (3,64) vs Conv1d (64,3,1))
        (np.asarray(
            g["pc_encoder_wrap"]["pc_encoder"]["pointnet_feat_extractor"]
             ["conv1"]["kernel"]).T[:, :, None],
         tm_pn.conv1.weight.grad.numpy(), "pointnet conv1"),
        # STN3d fc3 (deepest in the alignment branch)
        (np.asarray(
            g["pc_encoder_wrap"]["pc_encoder"]["pointnet_feat_extractor"]
             ["stn"]["fc3"]["kernel"]).T,
         tm_pn.stn.fc3.weight.grad.numpy(), "stn fc3"),
        # decoder node (0,0) first conv (stacked einsum vs torch module)
        (np.asarray(g["pc_decoder"]["node_conv1"]["kernel"])[0, 0].T[:, :, None],
         nodes[0][0]["conv1"].weight.grad.numpy(), "node_conv1[0,0]"),
        # shared deformer of cluster 0 (accumulated over its nodes in torch)
        (np.asarray(g["pc_decoder"]["deformer_conv1"]["kernel"])[0].T[:, :, None],
         deformers[0]["conv1"].weight.grad.numpy(), "deformer_conv1[0]"),
    ]
    # Measured agreement ~1e-3 of max-|grad| (f32 backward accumulation
    # through the 30-layer chains; f64 agreement is ~1e-7, see BN two-pass
    # variance note in nn/normalization.py).
    for ours, theirs, name in checks:
        scale = max(np.abs(theirs).max(), 1e-8)
        np.testing.assert_allclose(
            ours / scale, theirs / scale, atol=5e-3,
            err_msg=f"gradient mismatch: {name}")

    # --- eval mode with the updated running stats -------------------------
    out_eval = model.apply(
        {"params": variables["params"], "batch_stats": new_stats},
        jb, False, tp, method="loss",
    )
    with torch.no_grad():
        ttl_te, loss_qe, loss_se = run_torch_loss(
            tm_vgg, tm_pn, deformers, nodes, sample, raw_q, raw_s,
            train=False)
    # Measured agreement ~2e-7 rel.
    np.testing.assert_allclose(
        float(out_eval["ttl_loss"]), float(ttl_te), rtol=1e-5,
        err_msg="ttl_loss eval-mode (running stats) mismatch")
    np.testing.assert_allclose(
        float(out_eval["query_rec_loss"]), float(loss_qe), rtol=1e-5)
    np.testing.assert_allclose(
        float(out_eval["support_rec_loss"]), float(loss_se), rtol=1e-5)


def test_fast_stats_mode_matches_torch_losses(episode, models):
    """The production default (single-read shifted BN variance,
    precise_stats=False) must still reproduce the torch losses: train-mode
    to ~1e-4 (statistics differ by ~1e-7 rounding) and eval-mode (running
    stats accumulated in fast mode) to 1e-3."""
    import copy

    sample, raw_q, raw_s = episode
    _, variables, tm_vgg, tm_pn, deformers, nodes = models
    # The module-scoped torch replicas carry running stats mutated by the
    # precise-mode test; copy them and reset to the fresh-init stats the
    # flax side starts from.
    tm_vgg, tm_pn, deformers, nodes = (
        copy.deepcopy(tm_vgg), copy.deepcopy(tm_pn),
        copy.deepcopy(deformers), copy.deepcopy(nodes))

    def _reset(m):
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.reset_running_stats()

    tm_vgg.apply(_reset)
    tm_pn.apply(_reset)
    for dl in deformers:
        for m in dl.values():
            m.apply(_reset)
    for cl in nodes:
        for nl in cl:
            for m in nl.values():
                m.apply(_reset)

    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet",
        num_clusters=C, num_nodes=NN_, num_points=NPTS,
        bottleneck_size=BOTT, intra_support=True, precise_stats=False,
    )
    jb = {k: jnp.asarray(v) for k, v in sample.items()}
    tp = {"query": jnp.asarray(raw_q), "support": jnp.asarray(raw_s)}
    out, mut = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jb, True, tp, method="loss", mutable=["batch_stats"],
    )
    ttl_t, loss_q_t, loss_s_t = run_torch_loss(
        tm_vgg, tm_pn, deformers, nodes, sample, raw_q, raw_s, train=True)
    np.testing.assert_allclose(
        float(out["ttl_loss"]), float(ttl_t.detach()), rtol=3e-4)
    out_eval = model.apply(
        {"params": variables["params"],
         "batch_stats": mut["batch_stats"]},
        jb, False, tp, method="loss",
    )
    with torch.no_grad():
        ttl_te, _, _ = run_torch_loss(
            tm_vgg, tm_pn, deformers, nodes, sample, raw_q, raw_s,
            train=False)
    np.testing.assert_allclose(
        float(out_eval["ttl_loss"]), float(ttl_te), rtol=1e-3)
