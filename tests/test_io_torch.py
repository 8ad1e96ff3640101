"""Torch-checkpoint ingestion: reader exactness + golden feature parity.

The strongest parity evidence available without the dataset: load the
reference's shipped pretrained PointNet into (a) our flax encoder via the
no-torch reader/converter and (b) an independently-written torch PointNet
with the same architecture, then compare eval-mode features on random
clouds.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from fpsg_tpu.io import load_pretrained_pc_encoder, load_torch_checkpoint
from fpsg_tpu.models.protonet import PCEncoder

CKPT = "/root/reference/checkpoint/pretrain_pointnet/pretrained_pcencoder_pointnet.pt"
CKPT_LEGACY = "/root/reference/checkpoint/pretrain_dgcnn/pretrained_pcencoder_dgcnn.pt"

needs_ckpt = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoint not available"
)


# --- independently-written torch PointNet (eval-path only) -----------------

class TorchSTN3d(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1, self.conv2, self.conv3 = (
            tnn.Conv1d(3, 64, 1), tnn.Conv1d(64, 128, 1),
            tnn.Conv1d(128, 1024, 1))
        self.fc1, self.fc2, self.fc3 = (
            tnn.Linear(1024, 512), tnn.Linear(512, 256), tnn.Linear(256, 9))
        self.bn1, self.bn2, self.bn3, self.bn4, self.bn5 = (
            tnn.BatchNorm1d(64), tnn.BatchNorm1d(128), tnn.BatchNorm1d(1024),
            tnn.BatchNorm1d(512), tnn.BatchNorm1d(256))

    def forward(self, x):
        b = x.shape[0]
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = F.relu(self.bn3(self.conv3(h)))
        h = torch.max(h, 2).values
        h = F.relu(self.bn4(self.fc1(h)))
        h = F.relu(self.bn5(self.fc2(h)))
        h = self.fc3(h)
        return (h + torch.eye(3).reshape(9)).reshape(b, 3, 3)


class TorchPointNetFeat(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stn = TorchSTN3d()
        self.conv1, self.conv2, self.conv3 = (
            tnn.Conv1d(3, 64, 1), tnn.Conv1d(64, 128, 1),
            tnn.Conv1d(128, 1024, 1))
        self.bn1, self.bn2, self.bn3 = (
            tnn.BatchNorm1d(64), tnn.BatchNorm1d(128), tnn.BatchNorm1d(1024))

    def forward(self, x):
        trans = self.stn(x)
        h = torch.bmm(x.transpose(2, 1), trans).transpose(2, 1)
        h = F.relu(self.bn1(self.conv1(h)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return torch.max(h, 2).values


@needs_ckpt
def test_reader_matches_torch_load():
    ours = load_torch_checkpoint(CKPT)
    theirs = torch.load(CKPT, map_location="cpu")
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_array_equal(np.asarray(ours[k]),
                                      theirs[k].numpy())


@needs_ckpt
def test_legacy_reader_matches_torch_load():
    ours = load_torch_checkpoint(CKPT_LEGACY)
    theirs = torch.load(CKPT_LEGACY, map_location="cpu")
    assert set(ours) == set(theirs)
    for k in theirs:
        np.testing.assert_array_equal(np.asarray(ours[k]),
                                      theirs[k].numpy())


@needs_ckpt
def test_golden_pointnet_feature_parity(rng):
    # torch side
    tmodel = TorchPointNetFeat()
    sd = torch.load(CKPT, map_location="cpu")
    sd = {k[len("pc_encoder.pointnet_feat_extractor."):]: v
          for k, v in sd.items()}
    tmodel.load_state_dict(sd)
    tmodel.eval()

    # flax side via the no-torch reader/converter
    enc = PCEncoder(core="pointnet")
    x = rng.standard_normal((4, 256, 3)).astype(np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.array(x), False)
    loaded = load_pretrained_pc_encoder(CKPT)
    # shape agreement guard, then swap in converted weights
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
                 variables["params"], loaded["params"])
    feat_j = enc.apply(
        {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
        jnp.array(x), False,
    )
    with torch.no_grad():
        feat_t = tmodel(torch.from_numpy(x).permute(0, 2, 1))

    np.testing.assert_allclose(
        np.asarray(feat_j), feat_t.numpy(), rtol=1e-4, atol=1e-4)


def test_reader_handles_torch_save_varied_dtypes(tmp_path, rng):
    """torch.save → our reader, across dtypes/shapes/0-dim."""
    from fpsg_tpu.io.torch_pickle import load_torch_checkpoint

    sd = {
        "f32": torch.tensor(rng.standard_normal((3, 5)), dtype=torch.float32),
        "f64": torch.tensor(rng.standard_normal(7), dtype=torch.float64),
        "i64": torch.arange(6, dtype=torch.int64).reshape(2, 3),
        "i32": torch.tensor([1, -2, 3], dtype=torch.int32),
        "u8": torch.tensor([[0, 255]], dtype=torch.uint8),
        "bool": torch.tensor([True, False]),
        "scalar": torch.tensor(4, dtype=torch.int64),
        "f16": torch.tensor([1.5, -2.25], dtype=torch.float16),
        "noncontig": torch.tensor(
            rng.standard_normal((4, 6)), dtype=torch.float32).t(),
    }
    p = str(tmp_path / "varied.pt")
    torch.save(sd, p)
    ours = load_torch_checkpoint(p)
    assert set(ours) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(np.asarray(ours[k]), v.numpy())


def test_reader_handles_nested_containers(tmp_path, rng):
    from fpsg_tpu.io.torch_pickle import load_torch_checkpoint

    obj = {
        "nested": {"a": torch.ones(3), "b": [torch.zeros(2), 5, "text"]},
        "tuple": (torch.full((2, 2), 7.0), None),
    }
    p = str(tmp_path / "nested.pt")
    torch.save(obj, p)
    ours = load_torch_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(ours["nested"]["a"]),
                                  np.ones(3, np.float32))
    assert ours["nested"]["b"][1] == 5 and ours["nested"]["b"][2] == "text"
    np.testing.assert_array_equal(np.asarray(ours["tuple"][0]),
                                  np.full((2, 2), 7.0, np.float32))
    assert ours["tuple"][1] is None


def test_reader_refuses_arbitrary_globals(tmp_path):
    """ADVICE r1: loading an untrusted .pt must never execute code — any
    global outside the torch state-dict whitelist raises UnpicklingError."""
    import pickle
    import zipfile

    from fpsg_tpu.io.torch_pickle import load_torch_checkpoint

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("echo pwned",))

    # zip-format torch file carrying a code-executing pickle
    p = str(tmp_path / "evil.pt")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("evil/data.pkl", pickle.dumps(Evil()))
    with pytest.raises(pickle.UnpicklingError, match="forbidden"):
        load_torch_checkpoint(p)

    # legacy-format preamble smuggling a global instead of the magic int
    p2 = str(tmp_path / "evil_legacy.pt")
    with open(p2, "wb") as f:
        f.write(pickle.dumps(Evil()))
    with pytest.raises(pickle.UnpicklingError, match="forbidden"):
        load_torch_checkpoint(p2)
