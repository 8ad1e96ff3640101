"""Qualitative sample rendering (reference ``src/models/visualization.py``
and ``draw_reconstruction``, few_shot.py:179-213).

Outputs keep the reference's artifact layout: a side-by-side predicted/GT
PNG panel plus ``.npy`` dumps of both clouds. The reference trainer's call
was broken (string/list contract mismatch, SURVEY.md §5.1 item 5); here the
signature is explicit.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def visualize_point_clouds(
    pred: np.ndarray, gt: np.ndarray, idx: int = 0
) -> np.ndarray:
    """Render pred-vs-GT 3D scatters to an RGB array (CHW like the
    reference, visualization.py:9-28)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 3))
    for i, (cloud, title) in enumerate(
        [(np.asarray(pred), f"sample {idx}"), (np.asarray(gt), "ground truth")]
    ):
        ax = fig.add_subplot(1, 2, i + 1, projection="3d")
        ax.set_title(title)
        ax.scatter(cloud[:, 0], cloud[:, 2], cloud[:, 1], s=2)
        ax.set_xlim(-1, 1), ax.set_ylim(-1, 1), ax.set_zlim(-1, 1)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
    plt.close(fig)
    return buf.transpose(2, 0, 1)  # CHW, matching the reference


def draw_reconstruction(
    syn_pc: np.ndarray,
    gt_pc: np.ndarray,
    out_dir: str,
    tag: str,
    tmp_code: Optional[int] = None,
) -> str:
    """Write the panel PNG + ``.npy`` clouds like few_shot.py:202-213.

    Files: ``<out_dir>/<tag>.png``, ``<tag>_<code>.npy`` (prediction),
    ``<tag>_<code>_gt.npy`` (ground truth).
    """
    import imageio

    os.makedirs(out_dir, exist_ok=True)
    panels = [
        visualize_point_clouds(syn_pc[i], gt_pc[i], i)
        for i in range(len(syn_pc))
    ]
    img = np.concatenate(panels, axis=1)
    png_path = os.path.join(out_dir, f"{tag}.png")
    imageio.imwrite(png_path, img.transpose(1, 2, 0))
    code = 0 if tmp_code is None else int(tmp_code)
    np.save(os.path.join(out_dir, f"{tag}_{code}.npy"),
            np.asarray(syn_pc[0]))
    np.save(os.path.join(out_dir, f"{tag}_{code}_gt.npy"),
            np.asarray(gt_pc[0]))
    return png_path
