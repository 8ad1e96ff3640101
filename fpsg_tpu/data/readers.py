"""File readers and per-item preprocessing.

Mirrors the reference's loaders exactly (``src/datasets/modelnet.py:15-79``,
``src/datasets/shapenet.py:31-100``): ASCII PLY capped at 2048 vertices,
pad-by-resampling, unit-ball normalization, optional rotate-y + jitter
augmentation, and the torchvision image transform chains
(``src/trainNetwork.py:22-34``). Images are stored as uint8 after the
geometric transforms; the value normalization ``(x/255 - .5)/.5`` runs on
device (fpsg_tpu.data.corpus) so the HBM-resident corpus stays 4x smaller.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def read_ply(file_path: str, n_pts: int = 2048) -> np.ndarray:
    """ASCII PLY vertex reader: min(vertex_count, n_pts) vertices
    (reference ``ply_reader``, modelnet.py:15-29)."""
    max_verts = n_pts
    with open(file_path, "r") as f:
        n_verts = max_verts
        while True:
            line = f.readline().strip()
            if line == "end_header":
                break
            parts = line.split(" ")
            if len(parts) > 2 and parts[1] == "vertex":
                n_verts = min(int(parts[2]), max_verts)
        verts = [
            [float(s) for s in f.readline().strip().split(" ")][:3]
            for _ in range(n_verts)
        ]
    return np.asarray(verts, np.float32)


def pad_and_normalize_cloud(
    point_set: np.ndarray,
    n_pts: int = 2048,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Pad by resampling existing points, center, scale to the unit ball
    (modelnet.py:61-69)."""
    rng = rng or np.random.default_rng()
    point_set = np.asarray(point_set, np.float32)
    if point_set.shape[0] < n_pts:
        choice = rng.choice(
            len(point_set), n_pts - point_set.shape[0], replace=True
        )
        point_set = np.concatenate([point_set, point_set[choice]])
    center = point_set.mean(axis=0, keepdims=True)
    point_set = point_set - center
    dist = np.sqrt((point_set ** 2).sum(axis=1)).max()
    return point_set / max(dist, 1e-12)


def augment_cloud(
    point_set: np.ndarray, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Random rotation about y + gaussian jitter (modelnet.py:71-75)."""
    rng = rng or np.random.default_rng()
    theta = rng.uniform(0, 2 * np.pi)
    rot = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    out = point_set.copy()
    out[:, [0, 2]] = out[:, [0, 2]] @ rot
    out += rng.normal(0, 0.02, size=out.shape)
    return out.astype(np.float32)


def _center_crop(img: "np.ndarray", size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    out = img[top: top + size, left: left + size]
    if out.shape[0] < size or out.shape[1] < size:  # pad if image smaller
        pad_h, pad_w = size - out.shape[0], size - out.shape[1]
        out = np.pad(
            out,
            ((pad_h // 2, pad_h - pad_h // 2),
             (pad_w // 2, pad_w - pad_w // 2), (0, 0)),
        )
    return out


def image_to_uint8(
    path_or_img, crop: int, size: int = 224
) -> np.ndarray:
    """CenterCrop(crop) → Resize(size) → uint8 HWC.

    Equivalent geometry to the reference transform chains
    (``_modelnet_tfs``/``_shapenet_tfs``, trainNetwork.py:22-34); the value
    normalization happens on device.
    """
    from PIL import Image

    if isinstance(path_or_img, (str, bytes)):
        img = Image.open(path_or_img).convert("RGB")
    else:
        img = path_or_img.convert("RGB")
    arr = np.asarray(img, np.uint8)
    arr = _center_crop(arr, crop)
    img = Image.fromarray(arr).resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def modelnet_image_transform(path_or_img) -> np.ndarray:
    """CenterCrop(550) → 224 (trainNetwork.py:22-27)."""
    return image_to_uint8(path_or_img, crop=550)


def shapenet_image_transform(path_or_img) -> np.ndarray:
    """CenterCrop(256) → 224 (trainNetwork.py:29-34)."""
    return image_to_uint8(path_or_img, crop=256)


def normalize_image_np(img_u8: np.ndarray) -> np.ndarray:
    """Host-side equivalent of the on-device normalization (tests)."""
    return (img_u8.astype(np.float32) / 255.0 - 0.5) / 0.5
