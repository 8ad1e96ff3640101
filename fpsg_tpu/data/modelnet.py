"""ModelNet episodic corpus loader (reference ``src/datasets/modelnet.py``).

Reads the per-class support manifests (``modelnet_files/modelnet+<cls>.txt``,
img\\tply lines) into a :class:`~fpsg_tpu.data.corpus.ClassCorpus`. The
reference's giant-DataLoader preload (modelnet.py:130-153) becomes a plain
numpy pass; episode assembly moves on-device (corpus.py).

The reference derives an item's class from a hardcoded path depth
(``img_path.split('/')[-4]``, modelnet.py:112 — flagged in its README);
here class identity comes from the per-class manifest the item appears in,
which is equivalent and path-layout-agnostic.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from fpsg_tpu.data.corpus import ClassCorpus
from fpsg_tpu.data.readers import (
    augment_cloud,
    modelnet_image_transform,
    pad_and_normalize_cloud,
    read_ply,
)


def load_modelnet_corpus(
    auxiliary_dir: str,
    classes: Optional[list] = None,
    n_pts: int = 2048,
    image_transform: Callable = modelnet_image_transform,
    data_augment: bool = False,
    seed: Optional[int] = 0,
    config_path: Optional[str] = None,
    use_native: bool = True,
) -> ClassCorpus:
    """Build the per-class corpus from ``modelnet+<class>.txt`` files.

    Args:
      auxiliary_dir: the reference's ``--refer_path`` folder of per-class
        manifests.
      classes: restrict to these class names; default: every manifest file.
      config_path: optional global manifest (``modelnet_{train,test}.txt``);
        when given, only classes present in it are loaded (mirrors how the
        reference pairs ``--config_path`` with ``--refer_path``).
    """
    rng = np.random.default_rng(seed)

    # Items listed in the global manifest seed episodes; all manifest
    # classes still join the corpus (= the reference's ad-set behavior).
    allowed = None
    if config_path:
        allowed = set()
        with open(config_path) as f:
            for line in f:
                img_path = line.rstrip("\n").split("\t")[0]
                if img_path:
                    allowed.add(img_path)

    names, images, clouds, eligible = [], [], [], []
    for fname in sorted(os.listdir(auxiliary_dir)):
        if not fname.endswith(".txt"):
            continue
        cls = fname.split(".")[0].split("+")[1]
        if classes is not None and cls not in classes:
            continue
        cls_imgs, cls_pcs = [], []
        pc_paths = []
        cls_eligible = allowed is None
        with open(os.path.join(auxiliary_dir, fname)) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                img_path, pc_path = line.split("\t")
                if allowed is not None and img_path in allowed:
                    cls_eligible = True
                cls_imgs.append(image_transform(img_path))
                pc_paths.append(pc_path)
        if not cls_imgs:
            continue

        # Point clouds: native threaded batch loader when built (4x+ the
        # Python path — the reference's preload takes minutes), else the
        # pure-Python readers.
        native_ok = False
        if use_native:
            from fpsg_tpu.io import native

            if native.available():
                stacked, status = native.load_ply_batch(
                    pc_paths, n_pts, normalize=True,
                    seed=0 if seed is None else seed,
                )
                if (status > 0).all():
                    cls_pcs = list(stacked)
                    native_ok = True
        if not native_ok:
            cls_pcs = [
                pad_and_normalize_cloud(read_ply(p, n_pts), n_pts, rng)
                for p in pc_paths
            ]
        if data_augment:
            cls_pcs = [augment_cloud(pc, rng) for pc in cls_pcs]
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
