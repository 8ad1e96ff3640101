"""Classification corpora for point-cloud-encoder pretraining.

Re-states the reference pretraining datasets (``src/datasets/mv_dataset.py``:
``MultiViewDataSet`` :55-141, ``ShapeNet55`` :145-231) as plain
(clouds, labels) arrays. The reference's ``trainPointAE`` loads multi-view
images too but never uses them in the loss (SURVEY.md §2.1) — image loading
is therefore skipped here (pass ``with_images=True`` for the full tuples).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from fpsg_tpu.data.manifest import SHAPENET_ID2NAME
from fpsg_tpu.data.readers import (
    augment_cloud, pad_and_normalize_cloud, read_ply,
)

# Reference hardcoded pretrain category macros (trainPointAE.py:22-24).
PRETRAIN_MODELNET_CATS = [
    "airplane", "bathtub", "bed", "chair", "desk",
    "dresser", "monitor", "sofa", "table", "toilet",
]
PRETRAIN_SHAPENET_CATS = [
    "02691156", "02942699", "02958343", "03046257",
    "03001627", "03325088", "04004475", "04099429",
]


def load_multiview_classification(
    root: str,
    ply_root: str,
    split: str,
    categories: Optional[Sequence[str]] = None,
    n_pts: int = 2048,
    data_augment: bool = False,
    seed: Optional[int] = 0,
    extra_label: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """ModelNet tree → (clouds (N, n_pts, 3), labels (N,), class names).

    Layout: ``root/<label>/<split>/<item>/<view>.png`` +
    ``ply_root/<label>/<split>/<item>.ply`` (mv_dataset.py:86-103); classes
    sorted then indexed (find_classes, :56-63). ``extra_label`` restricts
    loading to one class while keeping the full label space — the V2
    single-class filter (mv_dataset_v2.py:90).
    """
    rng = np.random.default_rng(seed)
    categories = sorted(categories or PRETRAIN_MODELNET_CATS)
    class_to_idx = {c: i for i, c in enumerate(categories)}
    clouds, labels = [], []
    for label in categories:
        if extra_label is not None and label != extra_label:
            continue
        c_path = os.path.join(root, label, split)
        ply_path = os.path.join(ply_root, label, split)
        if not os.path.isdir(c_path):
            continue
        for item in sorted(os.listdir(c_path)):
            ply_item = os.path.join(ply_path, f"{item}.ply")
            if not os.path.exists(ply_item):
                continue
            pc = pad_and_normalize_cloud(read_ply(ply_item, n_pts), n_pts, rng)
            if data_augment:
                pc = augment_cloud(pc, rng)
            clouds.append(pc)
            labels.append(class_to_idx[label])
    return (
        np.stack(clouds).astype(np.float32),
        np.asarray(labels, np.int32),
        categories,
    )


def load_shapenet55_classification(
    root: str,
    split: str,
    categories: Optional[Sequence[str]] = None,
    n_pts: int = 2048,
    data_augment: bool = False,
    seed: Optional[int] = 0,
    extra_label: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """ShapeNet55 manifests → (clouds, labels, class names)
    (ShapeNet55, mv_dataset.py:145-231): per-synset ``{id}_{split}.txt``
    item lists, 15000→n_pts subsample at load, unit-ball normalize.
    ``extra_label`` is the V2 single-class filter (mv_dataset_v2.py:171-173).
    """
    rng = np.random.default_rng(seed)
    categories = list(categories or PRETRAIN_SHAPENET_CATS)
    names = sorted(SHAPENET_ID2NAME.get(c, c) for c in categories)
    class_to_idx = {n: i for i, n in enumerate(names)}
    clouds, labels = [], []
    for synset in categories:
        if extra_label is not None and synset != extra_label and \
                SHAPENET_ID2NAME.get(synset, synset) != extra_label:
            continue
        conf_file = os.path.join(root, f"{synset}_{split}.txt")
        if not os.path.exists(conf_file):
            continue
        cls_name = SHAPENET_ID2NAME.get(synset, synset)
        with open(conf_file) as f:
            items = [ln.strip() for ln in f if ln.strip()]
        for item in items:
            npy_file = os.path.join(root, synset, item, "models",
                                    "npy_file.npy")
            if not os.path.exists(npy_file):
                continue
            pc = np.load(npy_file)
            choice = rng.choice(len(pc), n_pts)
            pc = pad_and_normalize_cloud(pc[choice], n_pts, rng)
            if data_augment:
                pc = augment_cloud(pc, rng)
            clouds.append(pc)
            labels.append(class_to_idx[cls_name])
    return (
        np.stack(clouds).astype(np.float32),
        np.asarray(labels, np.int32),
        names,
    )


def synthetic_classification(
    n_classes: int = 3,
    items_per_class: int = 20,
    n_pts: int = 512,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """Procedural classification set for tests/CI."""
    from fpsg_tpu.data.synthetic import synthetic_corpus

    corpus = synthetic_corpus(
        n_classes=n_classes, items_per_class=items_per_class, n_pts=n_pts,
        img_size=16, seed=seed,
    )
    clouds = np.concatenate(corpus.clouds)
    labels = np.concatenate(
        [np.full(len(c), i, np.int32) for i, c in enumerate(corpus.clouds)]
    )
    return clouds.astype(np.float32), labels, corpus.class_names
