"""torch state-dict → flax variable-tree conversion.

Handles the reference's shipped artifacts:

- ``pretrained_pcencoder_{pointnet,dgcnn}.pt`` — loaded by the trainer
  straight into ``PCEncoder`` (``src/trainNetwork.py:57-60``); key layout
  verified in SURVEY.md §3.3.
- torchvision ``vgg16_bn`` state dicts for the image branch
  (``src/models/image_net.py:14``).

Transposition rules (torch → flax):
  Conv1d(k=1) weight (out, in, 1)  → Dense kernel (in, out)
  Linear weight (out, in)          → Dense kernel (in, out)
  Conv2d weight (out, in, kh, kw)  → Conv kernel (kh, kw, in, out)
  BN weight/bias                   → scale/bias           (params)
  BN running_mean/running_var      → mean/var             (batch_stats)
  num_batches_tracked              → dropped
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from fpsg_tpu.io.torch_pickle import load_torch_checkpoint

_BN_MAP = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _set(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


def torch_state_dict_to_flax(
    state_dict: Mapping[str, np.ndarray],
    bn_modules: Tuple[str, ...] = ("bn",),
) -> Dict[str, Any]:
    """Generic conversion of a flat torch state dict into
    ``{"params": ..., "batch_stats": ...}`` nested trees.

    A module is treated as a BatchNorm iff its leaf set includes
    ``running_mean`` (robust — no name heuristics needed).
    """
    del bn_modules
    # Group leaves by module path.
    modules: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}
    for key, val in state_dict.items():
        *mod, leaf = key.split(".")
        modules.setdefault(tuple(mod), {})[leaf] = np.asarray(val)

    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for mod, leaves in modules.items():
        if "running_mean" in leaves:  # BatchNorm
            for leaf, val in leaves.items():
                if leaf == "num_batches_tracked":
                    continue
                coll, name = _BN_MAP[leaf]
                _set(out[coll], mod + (name,), val)
            continue
        for leaf, val in leaves.items():
            if leaf == "weight":
                if val.ndim == 3:        # Conv1d k=1
                    assert val.shape[-1] == 1, val.shape
                    kernel = val[:, :, 0].T
                elif val.ndim == 2:      # Linear
                    kernel = val.T
                elif val.ndim == 4:      # Conv2d
                    kernel = val.transpose(2, 3, 1, 0)
                else:
                    raise ValueError(f"{'.'.join(mod)}.weight: {val.shape}")
                _set(out["params"], mod + ("kernel",), kernel)
            elif leaf == "bias":
                _set(out["params"], mod + ("bias",), val)
            else:
                raise ValueError(f"unknown leaf {'.'.join(mod)}.{leaf}")
    return out


# ---------------------------------------------------------------------------
# PCEncoder checkpoints
# ---------------------------------------------------------------------------

def _map_dgcnn_keys(mod: Tuple[str, ...]) -> Tuple[str, ...]:
    """Reference DGCNN uses nn.Sequential: conv{i}.0 = conv, conv{i}.1 = bn
    (dgcnn/model.py:53-57). Our modules: conv{i}/{conv,bn} and conv5/bn5."""
    if len(mod) >= 2 and mod[0].startswith("conv") and mod[1] in ("0", "1"):
        stage = mod[0]
        if stage == "conv5":
            return (stage,) if mod[1] == "0" else ("bn5",)
        return (stage, "conv") if mod[1] == "0" else (stage, "bn")
    return mod


def load_pretrained_pc_encoder(path: str, core: str = "pointnet"):
    """Ingest a reference pc-encoder checkpoint into our ``PCEncoder`` tree.

    torch keys: ``pc_encoder.pointnet_feat_extractor.*`` (pointnet) or
    ``pc_encoder.conv{i}.{0,1}.*`` (dgcnn). Our PCEncoder wraps the backbone
    under module name ``pc_encoder`` with matching inner names, so after the
    sequential-index fixup the paths line up 1:1.

    The checkpoint's key set is validated against ``core`` BEFORE
    conversion: the reference's own shipped
    ``pretrain_dgcnn/pretrained_pcencoder_dgcnn.pt`` actually contains a
    POINTNET state dict (keys ``pc_encoder.pointnet_feat_extractor.*`` —
    packaging bug; the reference's strict ``load_state_dict`` at
    ``src/trainNetwork.py:60`` would crash on it too). We fail with a
    diagnosis instead of a shape error deep inside flax.
    """
    sd = load_torch_checkpoint(path)
    is_pointnet_sd = any("pointnet_feat_extractor" in k for k in sd)
    want_pointnet = core == "pointnet"
    if is_pointnet_sd != want_pointnet:
        raise ValueError(
            f"{path} holds a "
            f"{'pointnet' if is_pointnet_sd else 'dgcnn'} state dict but "
            f"--pc_encoder is {core!r}. (Note: the reference repo ships "
            "a pointnet state dict under "
            "pretrain_dgcnn/pretrained_pcencoder_dgcnn.pt — its own "
            "loader would reject it as well; see PARITY.md §5.1.)"
        )
    if core == "dgcnn":
        remapped = {}
        for key, val in sd.items():
            parts = key.split(".")
            assert parts[0] == "pc_encoder", key
            mod, leaf = tuple(parts[1:-1]), parts[-1]
            new = ("pc_encoder",) + _map_dgcnn_keys(mod) + (leaf,)
            val = np.asarray(val)
            # Reference EdgeConv convs are Conv2d(k=1): (O, I, 1, 1).
            # Our decomposed EdgeConv applies them as a Dense over the
            # [x || x_j - x] channel axis (nn/dgcnn.py), so squeeze to
            # Conv1d(k=1) shape and let the generic rule emit (I, O).
            if leaf == "weight" and val.ndim == 4:
                assert val.shape[-2:] == (1, 1), (key, val.shape)
                val = val[:, :, :, 0]
            remapped[".".join(new)] = val
        sd = remapped
    return torch_state_dict_to_flax(sd)


# ---------------------------------------------------------------------------
# torchvision VGG16-bn
# ---------------------------------------------------------------------------

def load_torchvision_vgg16_bn(path: str):
    """Convert a torchvision ``vgg16_bn`` state dict for
    :class:`fpsg_tpu.nn.vgg.VGG16BN` (classifier head dropped).

    torch keys ``features.<i>.*`` map to our ``features_<i>`` flat names.
    """
    sd = load_torch_checkpoint(path)
    remapped = {}
    for key, val in sd.items():
        if not key.startswith("features."):
            continue  # classifier.* unused (encoder keeps .features only)
        _, idx, leaf = key.split(".")
        remapped[f"features_{idx}.{leaf}"] = val
    return torch_state_dict_to_flax(remapped)
