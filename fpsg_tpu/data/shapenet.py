"""ShapeNet episodic corpus loader (reference ``src/datasets/shapenet.py``).

Item layout: ``<item>/npy_file.npy`` (15000 points) + ``<item>/images/*``;
per-class manifests list item dirs. The reference subsamples 15000 → 2048
once at construction with *unseeded* RNG (shapenet.py:53-62 — SURVEY.md
§5.1 item 11, eval sets differ run-to-run); here the subsample is seeded by
default (pass ``seed=None`` for faithful nondeterminism).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from fpsg_tpu.data.corpus import ClassCorpus
from fpsg_tpu.data.manifest import SHAPENET_ID2NAME
from fpsg_tpu.data.readers import (
    augment_cloud,
    pad_and_normalize_cloud,
    shapenet_image_transform,
)


def load_shapenet_corpus(
    auxiliary_dir: str,
    classes: Optional[list] = None,
    n_pts: int = 2048,
    image_transform: Callable = shapenet_image_transform,
    data_augment: bool = False,
    seed: Optional[int] = 0,
    config_path: Optional[str] = None,
) -> ClassCorpus:
    """Build the per-class corpus from ``shapenet+<synset>.txt`` files.

    Like the ModelNet loader: all manifest classes join the (ad-set) corpus;
    only classes with an item in the global ``config_path`` manifest are
    episode-eligible (mirrors FewShotShapeNet's pairing of the global config
    with the per-class reference dict, shapenet.py:103-171).
    """
    rng = np.random.default_rng(seed)

    allowed = None
    if config_path:
        allowed = set()
        with open(config_path) as f:
            for line in f:
                item = line.rstrip("\n")
                if item:
                    allowed.add(item)

    names, images, clouds, eligible = [], [], [], []
    for fname in sorted(os.listdir(auxiliary_dir)):
        if not fname.endswith(".txt"):
            continue
        synset = fname.split(".")[0].split("+")[1]
        cls = SHAPENET_ID2NAME.get(synset, synset)
        if classes is not None and cls not in classes and synset not in classes:
            continue
        cls_imgs, cls_pcs = [], []
        cls_eligible = allowed is None
        with open(os.path.join(auxiliary_dir, fname)) as f:
            for line in f:
                item_path = line.rstrip("\n")
                if not item_path:
                    continue
                if allowed is not None and item_path in allowed:
                    cls_eligible = True
                npy_file = os.path.join(item_path, "npy_file.npy")
                view_root = os.path.join(item_path, "images")
                if not os.path.exists(npy_file):
                    continue  # reference skips items w/o clouds (:43-44)
                views = sorted(os.listdir(view_root))
                if not views:
                    continue
                cls_imgs.append(
                    image_transform(os.path.join(view_root, views[0]))
                )
                pc = np.load(npy_file)
                choice = rng.choice(len(pc), n_pts)  # replace=True (ref :60)
                pc = pad_and_normalize_cloud(pc[choice], n_pts, rng)
                if data_augment:
                    pc = augment_cloud(pc, rng)
                cls_pcs.append(pc)
        if not cls_imgs:
            continue
        names.append(cls)
        images.append(np.stack(cls_imgs))
        clouds.append(np.stack(cls_pcs).astype(np.float32))
        eligible.append(cls_eligible)

    if not names:
        raise FileNotFoundError(
            f"no class manifests loaded from {auxiliary_dir}"
        )
    return ClassCorpus(
        class_names=names, images=images, clouds=clouds,
        eligible=np.array(eligible, bool),
    )
