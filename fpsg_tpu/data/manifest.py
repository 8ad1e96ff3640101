"""Manifest generation (reference ``src/generate_dataset.py`` semantics).

Emits the exact on-disk artifacts the episodic loaders consume:
- ``{dataset}_train.txt`` / ``{dataset}_test.txt`` — global item lists
  (img\\tply lines for ModelNet; item dirs for ShapeNet),
- ``{dataset}_files/{dataset}+{label}.txt`` — per-class support files.

Class splits are the reference's hardcoded base/novel sets
(generate_dataset.py:14-28), overridable per call.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

# Reference hardcoded splits (generate_dataset.py:14-28).
TRAIN_SET_DIC: Dict[str, List[str]] = {
    "modelnet": [
        "airplane", "bathtub", "bed", "chair", "desk",
        "dresser", "monitor", "sofa", "table", "toilet",
    ],
    "shapenet": [
        "airplane", "camera", "car", "clock", "chair",
        "faucet", "printer", "rocket",
    ],
}

TEST_SET_DIC: Dict[str, List[str]] = {
    "modelnet": ["cup", "keyboard", "door", "laptop", "bowl"],
    "shapenet": ["bowl", "cellphone", "jar", "mug", "monitor"],
}

# ShapeNet synset id → name (src/datasets/shapenet.py:13-27).
SHAPENET_ID2NAME: Dict[str, str] = {
    "02691156": "airplane",
    "02880940": "bowl",
    "02942699": "camera",
    "02958343": "car",
    "02992529": "cellphone",
    "03001627": "chair",
    "03046257": "clock",
    "03211117": "monitor",
    "03325088": "faucet",
    "03593526": "jar",
    "03797390": "mug",
    "04004475": "printer",
    "04099429": "rocket",
}
SHAPENET_NAME2ID = {v: k for k, v in SHAPENET_ID2NAME.items()}


def _write_pairs(path: str, imgs: Sequence[str], pcs: Sequence[str]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(f"{i}\t{p}" for i, p in zip(imgs, pcs)))


def _write_items(path: str, items: Sequence[str]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(items))


def generate_modelnet_manifests(
    img_root: str,
    pc_root: str,
    output: str = "./",
    train_classes: Optional[Sequence[str]] = None,
    test_classes: Optional[Sequence[str]] = None,
) -> None:
    """Walk ``img_root/<label>/<train|test>/<item>/<view>.png`` and
    ``pc_root/<label>/<train|test>/<item>.ply`` (generate_dataset.py:64-97).

    First view per item is used, matching the reference (:79).
    """
    train_classes = list(train_classes or TRAIN_SET_DIC["modelnet"])
    test_classes = list(test_classes or TEST_SET_DIC["modelnet"])
    train_imgs, train_pcs, test_imgs, test_pcs = [], [], [], []
    os.makedirs(os.path.join(output, "modelnet_files"), exist_ok=True)

    for label in sorted(os.listdir(img_root)):
        tmp_imgs, tmp_pcs = [], []
        for split in ["train", "test"]:
            c_path = os.path.join(img_root, label, split)
            ply_path = os.path.join(pc_root, label, split)
            if not os.path.isdir(c_path):
                continue
            for item in sorted(os.listdir(c_path)):
                views = sorted(os.listdir(os.path.join(c_path, item)))
                if not views:
                    continue
                img = os.path.join(c_path, item, views[0])
                ply = os.path.join(ply_path, f"{item}.ply")
                tmp_imgs.append(img)
                tmp_pcs.append(ply)
                if label in test_classes:
                    test_imgs.append(img)
                    test_pcs.append(ply)
                elif label in train_classes:
                    train_imgs.append(img)
                    train_pcs.append(ply)
        if label in test_classes or label in train_classes:
            _write_pairs(
                os.path.join(output, "modelnet_files", f"modelnet+{label}.txt"),
                tmp_imgs, tmp_pcs,
            )

    _write_pairs(os.path.join(output, "modelnet_train.txt"),
                 train_imgs, train_pcs)
    _write_pairs(os.path.join(output, "modelnet_test.txt"),
                 test_imgs, test_pcs)


def generate_shapenet_manifests(
    pc_root: str,
    output: str = "./",
    train_classes: Optional[Sequence[str]] = None,
    test_classes: Optional[Sequence[str]] = None,
) -> None:
    """ShapeNet: per-synset ``{id}_{split}.txt`` lists of item dirs, each
    containing ``models/npy_file.npy`` + ``models/images/*``
    (generate_dataset.py:99-129)."""
    train_ids = [SHAPENET_NAME2ID[n]
                 for n in (train_classes or TRAIN_SET_DIC["shapenet"])]
    test_ids = [SHAPENET_NAME2ID[n]
                for n in (test_classes or TEST_SET_DIC["shapenet"])]
    train_pcs, test_pcs = [], []
    os.makedirs(os.path.join(output, "shapenet_files"), exist_ok=True)

    for label in SHAPENET_ID2NAME:
        tmp_items = []
        for split in ["train", "test"]:
            file_path = os.path.join(pc_root, f"{label}_{split}.txt")
            if not os.path.exists(file_path):
                continue
            item_root = os.path.join(pc_root, label)
            with open(file_path) as f:
                names = [ln.strip() for ln in f if ln.strip()]
            items = [os.path.join(item_root, n, "models") for n in names]
            if label in train_ids:
                train_pcs += items
                tmp_items += items
            if label in test_ids:
                test_pcs += items
                tmp_items += items
        _write_items(
            os.path.join(output, "shapenet_files", f"shapenet+{label}.txt"),
            tmp_items,
        )

    _write_items(os.path.join(output, "shapenet_train.txt"), train_pcs)
    _write_items(os.path.join(output, "shapenet_test.txt"), test_pcs)


def train_test_split_lists(
    items: Sequence[str],
    test_fraction: float = 0.2,
    seed: Optional[int] = None,
):
    """80/20 random split (reference ``src/train_test_split.py:7-23``)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    items = list(items)
    perm = rng.permutation(len(items))
    n_test = int(len(items) * test_fraction)
    test = [items[i] for i in perm[:n_test]]
    train = [items[i] for i in perm[n_test:]]
    return train, test
