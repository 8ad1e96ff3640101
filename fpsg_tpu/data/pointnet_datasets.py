"""Standalone PointNet experiment datasets (reference
``src/pointnet/dataset.py``; component parity — not used by the FPSG main
path, SURVEY.md §2.5).

All loaders return numpy arrays ready for device upload:

- :func:`load_shapenet_part` — ShapeNet part-segmentation items
  (``.pts`` + ``.seg``; dataset.py:59-144), classification or segmentation.
- :func:`load_modelnet_split` — list-file ModelNet with PLY clouds
  (dataset.py:147-195).
- :func:`load_modelnet40_tree` — directory-tree ModelNet40
  (dataset.py:227-304).
- :func:`get_segmentation_classes` / :func:`gen_modelnet_id` — the misc
  file generators (dataset.py:13-56).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from fpsg_tpu.data.readers import (
    augment_cloud, pad_and_normalize_cloud, read_ply,
)


def _resample_normalize(
    pts: np.ndarray, npoints: int, rng, augment: bool
) -> Tuple[np.ndarray, np.ndarray]:
    choice = rng.choice(len(pts), npoints, replace=True)
    out = pts[choice]
    out = out - out.mean(0, keepdims=True)
    out = out / max(np.sqrt((out ** 2).sum(1)).max(), 1e-12)
    if augment:
        out = augment_cloud(out, rng)
    return out.astype(np.float32), choice


def read_category_file(root: str) -> Dict[str, str]:
    cat = {}
    with open(os.path.join(root, "synsetoffset2category.txt")) as f:
        for line in f:
            name, synset = line.strip().split()
            cat[name] = synset
    return cat


def load_shapenet_part(
    root: str,
    npoints: int = 2500,
    classification: bool = False,
    class_choice: Optional[Sequence[str]] = None,
    split: str = "train",
    data_augmentation: bool = True,
    seed: Optional[int] = 0,
):
    """ShapeNet part dataset: shuffled_{split}_file_list.json over
    ``<synset>/points/<id>.pts`` + ``points_label/<id>.seg``.

    Returns (clouds (N, npoints, 3), labels) for classification, or
    (clouds, segs (N, npoints), labels) for segmentation.
    """
    rng = np.random.default_rng(seed)
    cat = read_category_file(root)
    if class_choice is not None:
        cat = {k: v for k, v in cat.items() if k in class_choice}
    id2cat = {v: k for k, v in cat.items()}
    classes = dict(zip(sorted(cat), range(len(cat))))

    splitfile = os.path.join(
        root, "train_test_split", f"shuffled_{split}_file_list.json"
    )
    with open(splitfile) as f:
        filelist = json.load(f)

    clouds, segs, labels = [], [], []
    for entry in filelist:
        _, synset, uuid = entry.split("/")
        if synset not in id2cat:
            continue
        name = id2cat[synset]
        pts = np.loadtxt(
            os.path.join(root, synset, "points", uuid + ".pts")
        ).astype(np.float32)
        seg = np.loadtxt(
            os.path.join(root, synset, "points_label", uuid + ".seg")
        ).astype(np.int64)
        cloud, choice = _resample_normalize(
            pts, npoints, rng, data_augmentation
        )
        clouds.append(cloud)
        segs.append(seg[choice])
        labels.append(classes[name])

    clouds = np.stack(clouds)
    labels = np.asarray(labels, np.int64)
    if classification:
        return clouds, labels
    return clouds, np.stack(segs), labels


def load_modelnet_split(
    root: str,
    npoints: int = 2500,
    split: str = "train",
    data_augmentation: bool = True,
    class_to_idx: Optional[Dict[str, int]] = None,
    seed: Optional[int] = 0,
):
    """List-file ModelNet (``<root>/{split}.txt`` of ``cls/file.ply`` rows,
    dataset.py:147-195)."""
    rng = np.random.default_rng(seed)
    with open(os.path.join(root, f"{split}.txt")) as f:
        fns = [ln.strip() for ln in f if ln.strip()]
    if class_to_idx is None:
        names = sorted({fn.split("/")[0] for fn in fns})
        class_to_idx = {n: i for i, n in enumerate(names)}
    clouds, labels = [], []
    for fn in fns:
        pts = read_ply(os.path.join(root, fn), n_pts=10 ** 9)
        cloud, _ = _resample_normalize(pts, npoints, rng, data_augmentation)
        clouds.append(cloud)
        labels.append(class_to_idx[fn.split("/")[0]])
    return np.stack(clouds), np.asarray(labels, np.int64), class_to_idx


def load_modelnet40_tree(
    root: str,
    npoints: int = 2500,
    split: str = "train",
    data_augmentation: bool = True,
    seed: Optional[int] = 0,
):
    """Directory-tree ModelNet40 (``<root>/<cls>/<split>/*.ply``,
    dataset.py:227-304): pad-by-resampling when short (like the episodic
    loaders), then center/scale."""
    rng = np.random.default_rng(seed)
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    class_to_idx = {c: i for i, c in enumerate(classes)}
    clouds, labels = [], []
    for cls in classes:
        d = os.path.join(root, cls, split)
        if not os.path.isdir(d):
            continue
        for base, _, fnames in sorted(os.walk(d)):
            for fname in sorted(fnames):
                if not fname.lower().endswith(".ply"):
                    continue
                pts = read_ply(os.path.join(base, fname), n_pts=npoints)
                cloud = pad_and_normalize_cloud(pts, npoints, rng)
                if data_augmentation:
                    cloud = augment_cloud(cloud, rng)
                clouds.append(cloud)
                labels.append(class_to_idx[cls])
    if not clouds:
        raise RuntimeError("No data founded")
    return np.stack(clouds), np.asarray(labels, np.int64), class_to_idx


def get_segmentation_classes(root: str, out_path: str) -> Dict[str, int]:
    """Count per-category segmentation classes → ``num_seg_classes.txt``
    (dataset.py:13-45)."""
    cat = read_category_file(root)
    counts = {}
    for name, synset in cat.items():
        seg_dir = os.path.join(root, synset, "points_label")
        n = 0
        for fn in sorted(os.listdir(seg_dir)):
            labels = np.loadtxt(os.path.join(seg_dir, fn)).astype(np.uint8)
            n = max(n, len(np.unique(labels)))
        counts[name] = n
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        for name, n in counts.items():
            f.write(f"{name}\t{n}\n")
    return counts


def gen_modelnet_id(root: str, out_path: str) -> List[str]:
    """Class-id table from ``train.txt`` (dataset.py:48-56)."""
    classes = []
    with open(os.path.join(root, "train.txt")) as f:
        for line in f:
            classes.append(line.strip().split("/")[0])
    classes = sorted(np.unique(classes).tolist())
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        for i, c in enumerate(classes):
            f.write(f"{c}\t{i}\n")
    return classes
