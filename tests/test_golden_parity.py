"""Golden component parity vs torch executions with identical weights.

For each compute branch we build an independently-written torch model with
the reference's architecture, copy OUR flax-initialized weights into it, run
both on the same inputs (and the same template samples), and compare
outputs. This pins down conv/BN semantics, layer ordering, and the fused
decoder's equivalence to the reference's 16-module-call structure.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from fpsg_tpu.nn.decoder import PrimitiveDecoder
from fpsg_tpu.nn.dgcnn import DGCNNFeat
from fpsg_tpu.nn.vgg import VGG16BN, VGG16_CFG


def t(x):
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# Decoder: fused einsum stack == per-(cluster, node) torch module calls
# ---------------------------------------------------------------------------

def build_torch_decoder(params, c, nn_, ori, w, d):
    """Per-cluster deformers + per-node MLPs with our weights loaded."""
    deformers, nodes = [], []
    p = params
    for ci in range(c):
        layers = {}
        for li, (i_dim, o_dim) in enumerate([(ori, w), (w, w), (w, 3)], 1):
            conv = tnn.Conv1d(i_dim, o_dim, 1)
            kern = np.asarray(p[f"deformer_conv{li}"]["kernel"])[ci]
            bias = np.asarray(p[f"deformer_conv{li}"]["bias"])[ci]
            with torch.no_grad():
                conv.weight.copy_(t(kern.T[:, :, None]))
                conv.bias.copy_(t(bias))
            layers[f"conv{li}"] = conv
            if li < 3:
                bn = tnn.BatchNorm1d(o_dim)
                with torch.no_grad():
                    bn.weight.copy_(
                        t(np.asarray(p[f"deformer_bn{li}"]["scale"])[ci]))
                    bn.bias.copy_(
                        t(np.asarray(p[f"deformer_bn{li}"]["bias"])[ci]))
                layers[f"bn{li}"] = bn
        deformers.append(layers)

        cluster_nodes = []
        dims = [d, d, d // 2, d // 4, 3]
        for ni in range(nn_):
            nlayers = {}
            for li in range(1, 5):
                conv = tnn.Conv1d(dims[li - 1], dims[li], 1)
                kern = np.asarray(p[f"node_conv{li}"]["kernel"])[ci, ni]
                bias = np.asarray(p[f"node_conv{li}"]["bias"])[ci, ni]
                with torch.no_grad():
                    conv.weight.copy_(t(kern.T[:, :, None]))
                    conv.bias.copy_(t(bias))
                nlayers[f"conv{li}"] = conv
                if li < 4:
                    bn = tnn.BatchNorm1d(dims[li])
                    with torch.no_grad():
                        bn.weight.copy_(
                            t(np.asarray(p[f"node_bn{li}"]["scale"])[ci, ni]))
                        bn.bias.copy_(
                            t(np.asarray(p[f"node_bn{li}"]["bias"])[ci, ni]))
                    nlayers[f"bn{li}"] = bn
            cluster_nodes.append(nlayers)
        nodes.append(cluster_nodes)
    return deformers, nodes


def run_torch_decoder(deformers, nodes, h, raw, train=True):
    """Reference forward (point_cloud_net.py:97-132): per cluster, per node:
    deform template, concat [cond ‖ deformed], node MLP; concat points."""
    for layers in deformers:
        for m in layers.values():
            m.train(train)
    for cl in nodes:
        for nlayers in cl:
            for m in nlayers.values():
                m.train(train)
    outs = []
    c = len(deformers)
    nn_ = len(nodes[0])
    for ci in range(c):
        dl = deformers[ci]
        for ni in range(nn_):
            x = t(raw[:, ci, ni]).transpose(2, 1)  # (B, ori, P)
            x = F.relu(dl["bn1"](dl["conv1"](x)))
            x = F.relu(dl["bn2"](dl["conv2"](x)))
            deformed = torch.tanh(dl["conv3"](x))
            cond = t(h).unsqueeze(2).repeat(1, 1, deformed.shape[2])
            y = torch.cat([cond, deformed], dim=1)
            nl = nodes[ci][ni]
            y = F.relu(nl["bn1"](nl["conv1"](y)))
            y = F.relu(nl["bn2"](nl["conv2"](y)))
            y = F.relu(nl["bn3"](nl["conv3"](y)))
            outs.append(torch.tanh(nl["conv4"](y)))
    return torch.cat(outs, dim=2).transpose(1, 2)


def test_decoder_matches_torch_reference_structure(rng):
    c, nn_, n_pts, bott, ori, w = 2, 2, 64, 48, 2, 16
    ppn = n_pts // c // nn_
    d = 3 + bott
    dec = PrimitiveDecoder(
        num_clusters=c, num_nodes=nn_, num_points=n_pts,
        bottleneck_size=bott, ori_dim=ori, deformer_width=w,
    )
    h = rng.standard_normal((3, bott)).astype(np.float32)
    raw = rng.uniform(0, 1, (3, c, nn_, ppn, ori)).astype(np.float32)

    variables = dec.init(
        {"params": jax.random.PRNGKey(0), "template": jax.random.PRNGKey(1)},
        jnp.array(h), True, template_points=jnp.array(raw),
    )
    out_j, mut = dec.apply(
        variables, jnp.array(h), True, template_points=jnp.array(raw),
        mutable=["batch_stats"],
    )

    deformers, nodes = build_torch_decoder(
        variables["params"], c, nn_, ori, w, d
    )
    with torch.no_grad():
        out_t = run_torch_decoder(deformers, nodes, h, raw, train=True)

    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-3, atol=5e-5)

    # Eval mode: torch's running stats were updated by the train forward
    # (incl. the shared deformer BN updated once per node, sequentially);
    # use our mutated stats — this also pins the sequential-fold running
    # update of the grouped BatchNorm.
    out_j_eval = dec.apply(
        {"params": variables["params"],
         "batch_stats": mut["batch_stats"]},
        jnp.array(h), False, template_points=jnp.array(raw),
    )
    with torch.no_grad():
        out_t_eval = run_torch_decoder(deformers, nodes, h, raw, train=False)
    np.testing.assert_allclose(
        np.asarray(out_j_eval), out_t_eval.numpy(), rtol=1e-3, atol=5e-5)


# ---------------------------------------------------------------------------
# DGCNN: EdgeConv stack vs torch
# ---------------------------------------------------------------------------

class TorchDGCNN(tnn.Module):
    """Reference DGCNN structure (dgcnn/model.py:45-88), CPU-safe."""

    def __init__(self, k=8):
        super().__init__()
        self.k = k
        mk = lambda i, o: tnn.Sequential(
            tnn.Conv2d(i, o, 1, bias=False), tnn.BatchNorm2d(o),
            tnn.LeakyReLU(0.2))
        self.conv1, self.conv2 = mk(6, 64), mk(128, 64)
        self.conv3, self.conv4 = mk(128, 128), mk(256, 256)
        self.conv5 = tnn.Sequential(
            tnn.Conv1d(512, 512, 1, bias=False), tnn.BatchNorm1d(512),
            tnn.LeakyReLU(0.2))

    @staticmethod
    def graph_feature(x, k):
        # x: (B, C, N)
        inner = -2 * torch.matmul(x.transpose(2, 1), x)
        xx = (x ** 2).sum(1, keepdim=True)
        d = -xx - inner - xx.transpose(2, 1)
        idx = d.topk(k, dim=-1).indices            # (B, N, k)
        b, c, n = x.shape
        idx_base = torch.arange(b).view(-1, 1, 1) * n
        flat = (idx + idx_base).reshape(-1)
        feat = x.transpose(2, 1).reshape(b * n, c)[flat].view(b, n, k, c)
        center = x.transpose(2, 1).view(b, n, 1, c).repeat(1, 1, k, 1)
        return torch.cat([feat - center, center], 3).permute(0, 3, 1, 2)

    def forward(self, x):
        b = x.shape[0]
        x1 = self.conv1(self.graph_feature(x, self.k)).max(-1).values
        x2 = self.conv2(self.graph_feature(x1, self.k)).max(-1).values
        x3 = self.conv3(self.graph_feature(x2, self.k)).max(-1).values
        x4 = self.conv4(self.graph_feature(x3, self.k)).max(-1).values
        h = self.conv5(torch.cat([x1, x2, x3, x4], 1))
        return torch.cat(
            [F.adaptive_max_pool1d(h, 1).view(b, -1),
             F.adaptive_avg_pool1d(h, 1).view(b, -1)], 1)


def test_dgcnn_matches_torch(rng):
    x = rng.standard_normal((2, 48, 3)).astype(np.float32)
    model = DGCNNFeat(k=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.array(x), False)

    tm = TorchDGCNN(k=8)
    p = variables["params"]
    with torch.no_grad():
        for i, name in enumerate(["conv1", "conv2", "conv3", "conv4"]):
            kern = np.asarray(p[name]["conv"]["kernel"])
            getattr(tm, name)[0].weight.copy_(t(kern.T[:, :, None, None]))
            getattr(tm, name)[1].weight.copy_(
                t(np.asarray(p[name]["bn"]["scale"])))
            getattr(tm, name)[1].bias.copy_(
                t(np.asarray(p[name]["bn"]["bias"])))
        tm.conv5[0].weight.copy_(
            t(np.asarray(p["conv5"]["kernel"]).T[:, :, None]))
        tm.conv5[1].weight.copy_(t(np.asarray(p["bn5"]["scale"])))
        tm.conv5[1].bias.copy_(t(np.asarray(p["bn5"]["bias"])))
    tm.eval()

    out_j = model.apply(variables, jnp.array(x), False)
    with torch.no_grad():
        out_t = tm(t(x).transpose(2, 1))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# VGG16-bn: converter + forward vs torch
# ---------------------------------------------------------------------------

class TorchVGG(tnn.Module):
    def __init__(self):
        super().__init__()
        layers, in_ch = [], 3
        for v in VGG16_CFG:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(in_ch, v, 3, padding=1),
                           tnn.BatchNorm2d(v), tnn.ReLU()]
                in_ch = v
        self.features = tnn.Sequential(*layers)

    def forward(self, x):
        h = self.features(x)
        return F.adaptive_avg_pool2d(h, 1).flatten(1)


def test_vgg16_matches_torch_via_converter(rng, tmp_path):
    """torch weights → torch save → our stdlib reader/converter → flax
    forward == torch forward."""
    from fpsg_tpu.io.convert import load_torchvision_vgg16_bn

    tm = TorchVGG()
    tm.eval()
    ckpt = str(tmp_path / "vgg.pth")
    torch.save(tm.state_dict(), ckpt)

    loaded = load_torchvision_vgg16_bn(ckpt)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    model = VGG16BN()
    out_j = model.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        jnp.array(x), False,
    )
    with torch.no_grad():
        out_t = tm(t(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-3, atol=1e-4)
