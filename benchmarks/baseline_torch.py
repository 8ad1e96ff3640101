"""Faithful PyTorch re-implementation of the reference training step, used
ONLY as the measured baseline for bench.py.

The reference environment (CUDA 11 + Kaolin CUDA Chamfer) is not available
here, so this re-states the same per-step computation — VGG16-bn forward on
[ad ‖ query] images, PointNet forward on [support ‖ ad] clouds, two decoder
passes (query + intra-support), O(N^2) Chamfer both directions, full
backward, Adam step — in plain torch, runnable on CPU. Architecture follows
SURVEY.md §2.2/§2.3 (independently written; benchmark-only code).
"""

from __future__ import annotations

import time

import torch
import torch.nn as nn
import torch.nn.functional as F


def chamfer(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    d = torch.cdist(a, b) ** 2
    return d.min(2).values.mean(1) + d.min(1).values.mean(1)


def vgg16_bn_features():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1),
                       nn.BatchNorm2d(v), nn.ReLU(inplace=True)]
            in_ch = v
    layers.append(nn.AdaptiveAvgPool2d((1, 1)))
    return nn.Sequential(*layers)


class PointNet(nn.Module):
    def __init__(self):
        super().__init__()
        def mlp(dims):
            mods = []
            for i in range(len(dims) - 1):
                mods += [nn.Conv1d(dims[i], dims[i + 1], 1),
                         nn.BatchNorm1d(dims[i + 1]), nn.ReLU()]
            return nn.Sequential(*mods)
        self.stn_convs = mlp([3, 64, 128, 1024])
        self.stn_fc = nn.Sequential(
            nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
            nn.Linear(256, 9))
        self.convs1 = mlp([3, 64])
        self.convs2 = mlp([64, 128])
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.bn3 = nn.BatchNorm1d(1024)

    def forward(self, x):          # (B, 3, N)
        t = self.stn_convs(x).max(2).values
        t = self.stn_fc(t).reshape(-1, 3, 3) + torch.eye(3)
        x = torch.bmm(x.transpose(2, 1), t).transpose(2, 1)
        x = self.convs1(x)
        x = self.convs2(x)
        x = self.bn3(self.conv3(x))
        return x.max(2).values     # (B, 1024)


class Decoder(nn.Module):
    """4 clusters x (shared deformer + 4 primitive nodes), 2048 points."""

    def __init__(self, bottleneck=1536, clusters=4, nodes=4, n_pts=2048):
        super().__init__()
        self.clusters, self.nodes = clusters, nodes
        self.ppn = n_pts // clusters // nodes
        d = 3 + bottleneck

        def deformer():
            return nn.Sequential(
                nn.Conv1d(2, 128, 1), nn.BatchNorm1d(128), nn.ReLU(),
                nn.Conv1d(128, 128, 1), nn.BatchNorm1d(128), nn.ReLU(),
                nn.Conv1d(128, 3, 1), nn.Tanh())

        def node():
            return nn.Sequential(
                nn.Conv1d(d, d, 1), nn.BatchNorm1d(d), nn.ReLU(),
                nn.Conv1d(d, d // 2, 1), nn.BatchNorm1d(d // 2), nn.ReLU(),
                nn.Conv1d(d // 2, d // 4, 1), nn.BatchNorm1d(d // 4),
                nn.ReLU(), nn.Conv1d(d // 4, 3, 1), nn.Tanh())

        self.deformers = nn.ModuleList([deformer() for _ in range(clusters)])
        self.node_pool = nn.ModuleList(
            [nn.ModuleList([node() for _ in range(nodes)])
             for _ in range(clusters)])

    def forward(self, h):          # (B, bottleneck)
        outs = []
        for c in range(self.clusters):
            for n in range(self.nodes):
                raw = torch.rand(h.shape[0], 2, self.ppn)
                deformed = self.deformers[c](raw)
                cond = h.unsqueeze(2).repeat(1, 1, self.ppn)
                outs.append(
                    self.node_pool[c][n](torch.cat([cond, deformed], 1)))
        return torch.cat(outs, dim=2).transpose(1, 2)


class RefModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.img_encoder = vgg16_bn_features()
        self.pc_encoder = PointNet()
        self.decoder = Decoder()

    def step_loss(self, xq, xad, pcs, pcad, pcq):
        img_z = self.img_encoder(torch.cat([xad, xq])).flatten(1)
        s = xad.shape[0]
        img_zad, img_zq = img_z[:s], img_z[s:]
        pc_z = self.pc_encoder(torch.cat([pcs, pcad]).transpose(2, 1))
        proto = pc_z[:s].mean(0, keepdim=True).repeat(xq.shape[0], 1)
        syn_q = self.decoder(torch.cat([img_zq, proto], 1))
        loss = chamfer(syn_q, pcq).sum()
        syn_s = self.decoder(torch.cat([img_zad, pc_z[s:]], 1))
        loss = loss + chamfer(syn_s, pcad).sum()
        return loss


def measure_baseline(steps: int = 3, n_support: int = 32,
                     n_query: int = 1, n_pts: int = 2048) -> float:
    torch.manual_seed(0)
    model = RefModel()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, betas=(0.9, 0.999))
    xq = torch.randn(n_query, 3, 224, 224)
    xad = torch.randn(n_support, 3, 224, 224)
    pcs = torch.randn(n_support, n_pts, 3) * 0.3
    pcad = torch.randn(n_support, n_pts, 3) * 0.3
    pcq = torch.randn(n_query, n_pts, 3) * 0.3

    # one warmup step
    opt.zero_grad(); model.step_loss(xq, xad, pcs, pcad, pcq).backward()
    opt.step()

    t0 = time.perf_counter()
    for _ in range(steps):
        opt.zero_grad()
        loss = model.step_loss(xq, xad, pcs, pcad, pcq)
        loss.backward()
        opt.step()
    dt = time.perf_counter() - t0
    return steps / dt


if __name__ == "__main__":
    eps = measure_baseline()
    print(f"torch-CPU reference baseline: {eps:.4f} episodes/s")
