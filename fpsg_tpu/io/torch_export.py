"""Write PyTorch-format checkpoints without a torch dependency.

The inverse of :mod:`fpsg_tpu.io.torch_pickle`: emits the modern zip-pickle
format (``archive/data.pkl`` + raw storages) that ``torch.load`` reads. This
preserves the reference's checkpoint interop in BOTH directions: models
trained here export as state dicts the reference code can
``load_state_dict`` directly —

- :func:`export_pc_encoder` writes the exact key layout of the shipped
  ``pretrained_pcencoder_pointnet.pt`` (``pc_encoder.pointnet_feat_
  extractor.*``), so our pretrainer can produce drop-in replacements for
  the reference trainer's ``--pc_encoder_path``;
- :func:`export_imgpcprotonet` writes the full reference ``ImgPCProtoNet``
  state dict (VGG ``img_encoder.img_feature_extractor.<i>.*``, wrapped
  ``pc_encoder.pc_encoder.*``, decoder ``pc_decoder.cluster_pool.<c>.
  {deformer,node_pool.<n>}.*``) by un-stacking our fused decoder weights.

The pickle is produced with a stdlib Pickler whose ``persistent_id`` emits
torch storage references and whose reducer emits
``torch._utils._rebuild_tensor_v2`` globals via stub functions carrying the
right ``__module__``/``__qualname__``.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Dict, Mapping

import numpy as np

_NP2STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("float16"): "HalfStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
    np.dtype("int16"): "ShortStorage",
    np.dtype("int8"): "CharStorage",
    np.dtype("uint8"): "ByteStorage",
    np.dtype("bool"): "BoolStorage",
}


# --- stub globals that pickle to torch names -------------------------------

def _make_stub(module: str, qualname: str):
    def stub(*a, **k):  # pragma: no cover - never called
        raise RuntimeError("export stub")

    stub.__module__ = module
    stub.__qualname__ = qualname
    stub.__name__ = qualname.split(".")[-1]
    return stub


_rebuild_tensor_v2 = _make_stub("torch._utils", "_rebuild_tensor_v2")
_STORAGE_STUBS = {
    name: _make_stub("torch", name) for name in set(_NP2STORAGE.values())
}


class _Tensor:
    """Placeholder that reduces to _rebuild_tensor_v2(storage_ref, ...)."""

    def __init__(self, arr: np.ndarray, key: str):
        self.arr = arr
        self.key = key

    def __reduce_ex__(self, protocol):
        arr = self.arr
        strides = tuple(s // arr.itemsize for s in arr.strides)
        storage_ref = _PersistentStorage(
            _NP2STORAGE[arr.dtype], self.key, arr.size
        )
        return (
            _rebuild_tensor_v2,
            (storage_ref, 0, tuple(arr.shape), strides, False, OrderedDict()),
        )


class _PersistentStorage:
    def __init__(self, storage_type: str, key: str, numel: int):
        self.storage_type = storage_type
        self.key = key
        self.numel = numel


class _Pickler(pickle._Pickler):
    """Pure-python pickler emitting torch global names by reference.

    ``save_global`` normally verifies importability; our stubs carry torch
    module/qualname metadata and are written directly as GLOBAL opcodes so
    no torch import is needed at export time (torch.load resolves them).
    """

    def persistent_id(self, obj):
        if isinstance(obj, _PersistentStorage):
            return (
                "storage",
                _STORAGE_STUBS[obj.storage_type],
                obj.key,
                "cpu",
                obj.numel,
            )
        return None

    def save_global(self, obj, name=None):
        module = getattr(obj, "__module__", "")
        if module.startswith("torch"):
            qual = obj.__qualname__
            self.write(
                pickle.GLOBAL
                + module.encode("utf-8") + b"\n"
                + qual.encode("utf-8") + b"\n"
            )
            self.memoize(obj)
            return
        super().save_global(obj, name)


# the base pickler's dispatch table binds FunctionType to the BASE
# save_global; point it at the override so torch-name stubs reach it
import types as _types  # noqa: E402

_Pickler.dispatch = pickle._Pickler.dispatch.copy()
_Pickler.dispatch[_types.FunctionType] = _Pickler.save_global


def save_torch_state_dict(
    path: str, state_dict: Mapping[str, np.ndarray]
) -> None:
    """Write ``state_dict`` (flat torch-style keys → numpy arrays) as a
    torch zip-pickle that ``torch.load`` accepts."""
    tensors = OrderedDict()
    storages: Dict[str, np.ndarray] = {}
    for i, (key, val) in enumerate(state_dict.items()):
        arr = np.asarray(val)
        if arr.ndim > 0:
            arr = np.ascontiguousarray(arr)  # keeps 0-dim 0-dim
        skey = str(i)
        tensors[key] = _Tensor(arr, skey)
        storages[skey] = arr

    buf = io.BytesIO()
    _Pickler(buf, protocol=2).dump(tensors)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        for skey, arr in storages.items():
            zf.writestr(f"archive/data/{skey}", arr.tobytes())


# ---------------------------------------------------------------------------
# flax → reference torch key layouts
# ---------------------------------------------------------------------------

def _to_conv1d(kernel: np.ndarray) -> np.ndarray:
    """flax Dense kernel (in, out) → torch Conv1d weight (out, in, 1)."""
    return np.asarray(kernel).T[:, :, None]


def _to_linear(kernel: np.ndarray) -> np.ndarray:
    return np.asarray(kernel).T


def _to_conv2d(kernel: np.ndarray) -> np.ndarray:
    """(kh, kw, in, out) → (out, in, kh, kw)."""
    return np.asarray(kernel).transpose(3, 2, 0, 1)


def _bn_entries(prefix: str, params: Dict, stats: Dict) -> Dict[str, np.ndarray]:
    return {
        f"{prefix}.weight": np.asarray(params["scale"]),
        f"{prefix}.bias": np.asarray(params["bias"]),
        f"{prefix}.running_mean": np.asarray(stats["mean"]),
        f"{prefix}.running_var": np.asarray(stats["var"]),
        f"{prefix}.num_batches_tracked": np.asarray(0, np.int64),
    }


def _pointnet_entries(prefix: str, p: Dict, s: Dict) -> Dict[str, np.ndarray]:
    """PointNetFeat subtree → torch ``<prefix>.{stn.*, conv*, bn*}``."""
    out: Dict[str, np.ndarray] = {}
    fc_names = {"fc1", "fc2", "fc3"}
    for mod, sub in p.items():
        if mod == "stn" or mod == "fstn":
            for inner, isub in sub.items():
                if "kernel" in isub:
                    conv = _to_linear(isub["kernel"]) if inner in fc_names \
                        else _to_conv1d(isub["kernel"])
                    out[f"{prefix}.{mod}.{inner}.weight"] = conv
                    out[f"{prefix}.{mod}.{inner}.bias"] = np.asarray(
                        isub["bias"]
                    )
                else:  # bn
                    out.update(_bn_entries(
                        f"{prefix}.{mod}.{inner}", isub, s[mod][inner]
                    ))
        elif "kernel" in sub:
            out[f"{prefix}.{mod}.weight"] = _to_conv1d(sub["kernel"])
            out[f"{prefix}.{mod}.bias"] = np.asarray(sub["bias"])
        else:  # bn
            out.update(_bn_entries(f"{prefix}.{mod}", sub, s[mod]))
    return out


def export_pc_encoder(path: str, variables: Mapping) -> None:
    """Write our PCEncoder variables in the SHIPPED checkpoint layout
    (``pc_encoder.pointnet_feat_extractor.*``) — loadable by the reference
    trainer's ``PCEncoder.load_state_dict`` (trainNetwork.py:57-60).

    Args:
      variables: {'params': ..., 'batch_stats': ...} of the PCEncoder
        subtree (i.e. ``state.params['pc_encoder_wrap']`` level).
    """
    p = variables["params"]["pc_encoder"]["pointnet_feat_extractor"]
    s = variables["batch_stats"]["pc_encoder"]["pointnet_feat_extractor"]
    sd = _pointnet_entries("pc_encoder.pointnet_feat_extractor", p, s)
    save_torch_state_dict(path, sd)


def export_imgpcprotonet(path: str, variables: Mapping,
                         num_clusters: int = 4, num_nodes: int = 4) -> None:
    """Write the full model in the reference ``ImgPCProtoNet`` state-dict
    layout: un-stacks the fused decoder into ``pc_decoder.cluster_pool.<c>``
    modules."""
    p, s = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    # --- image branch: img_encoder.img_feature_extractor.<i>.* ----------
    enc_p = p["img_encoder"]["encoder"]
    enc_s = s["img_encoder"]["encoder"]
    for name in enc_p:
        idx = name.split("_")[1]
        tprefix = f"img_encoder.img_feature_extractor.{idx}"
        if "kernel" in enc_p[name]:
            sd[f"{tprefix}.weight"] = _to_conv2d(enc_p[name]["kernel"])
            sd[f"{tprefix}.bias"] = np.asarray(enc_p[name]["bias"])
        else:
            sd.update(_bn_entries(tprefix, enc_p[name], enc_s[name]))

    # --- pc branch: pc_encoder.pc_encoder.pointnet_feat_extractor.* ------
    sd.update(_pointnet_entries(
        "pc_encoder.pc_encoder.pointnet_feat_extractor",
        p["pc_encoder_wrap"]["pc_encoder"]["pointnet_feat_extractor"],
        s["pc_encoder_wrap"]["pc_encoder"]["pointnet_feat_extractor"],
    ))

    # --- decoder: un-stack (C, ...) / (C, Nn, ...) -----------------------
    dp, ds_ = p["pc_decoder"], s["pc_decoder"]
    for c in range(num_clusters):
        cpfx = f"pc_decoder.cluster_pool.{c}"
        for li in (1, 2, 3):
            kern = np.asarray(dp[f"deformer_conv{li}"]["kernel"])[c]
            bias = np.asarray(dp[f"deformer_conv{li}"]["bias"])[c]
            sd[f"{cpfx}.deformer.conv{li}.weight"] = _to_conv1d(kern)
            sd[f"{cpfx}.deformer.conv{li}.bias"] = bias
        for li in (1, 2):
            bn_p = {k: np.asarray(v)[c]
                    for k, v in dp[f"deformer_bn{li}"].items()}
            bn_s = {k: np.asarray(v)[c]
                    for k, v in ds_[f"deformer_bn{li}"].items()}
            sd.update(_bn_entries(f"{cpfx}.deformer.bn{li}", bn_p, bn_s))
        for n in range(num_nodes):
            npfx = f"{cpfx}.node_pool.{n}"
            for li in (1, 2, 3, 4):
                kern = np.asarray(dp[f"node_conv{li}"]["kernel"])[c, n]
                bias = np.asarray(dp[f"node_conv{li}"]["bias"])[c, n]
                sd[f"{npfx}.conv{li}.weight"] = _to_conv1d(kern)
                sd[f"{npfx}.conv{li}.bias"] = bias
            for li in (1, 2, 3):
                bn_p = {k: np.asarray(v)[c, n]
                        for k, v in dp[f"node_bn{li}"].items()}
                bn_s = {k: np.asarray(v)[c, n]
                        for k, v in ds_[f"node_bn{li}"].items()}
                sd.update(_bn_entries(f"{npfx}.bn{li}", bn_p, bn_s))

    save_torch_state_dict(path, sd)
