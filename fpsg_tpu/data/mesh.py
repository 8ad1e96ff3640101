"""Mesh utilities replacing the reference's C++ tool dependencies
(SURVEY.md §2.4 N5/N6): OFF reading, area-weighted surface sampling
(PCL ``pcl_mesh_sampling`` analog), and PLY writing (``pcl_pcd2ply`` /
``off2ply``, view_generator.py:32-69)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def read_off(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read an OFF mesh → (verts (V,3) f32, faces (F,3) i64).

    Handles the ModelNet quirk of 'OFF' fused with the count line."""
    with open(path) as f:
        header = f.readline().strip()
        if header == "OFF":
            counts = f.readline().split()
        elif header.startswith("OFF"):
            counts = header[3:].split()
        else:
            raise ValueError(f"not an OFF file: {path}")
        n_verts, n_faces = int(counts[0]), int(counts[1])
        verts = np.array(
            [[float(x) for x in f.readline().split()[:3]]
             for _ in range(n_verts)],
            np.float32,
        )
        faces = []
        for _ in range(n_faces):
            parts = [int(x) for x in f.readline().split()]
            k = parts[0]
            poly = parts[1: 1 + k]
            if any(v < 0 or v >= n_verts for v in poly):  # malformed face
                raise ValueError(
                    f"face index out of range in OFF file: {path}"
                )
            for i in range(1, k - 1):  # fan-triangulate
                faces.append([poly[0], poly[i], poly[i + 1]])
    return verts, np.asarray(faces, np.int64).reshape(-1, 3)


def sample_mesh_surface(
    verts: np.ndarray,
    faces: np.ndarray,
    n_points: int,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Uniform area-weighted surface sampling via barycentric coordinates."""
    rng = rng or np.random.default_rng()
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total = areas.sum()
    if total <= 0:
        idx = rng.integers(0, len(verts), n_points)
        return verts[idx]
    probs = areas / total
    tri = rng.choice(len(faces), n_points, p=probs)
    u, v = rng.uniform(size=(2, n_points))
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    return (
        a[tri] + u[:, None] * (b[tri] - a[tri]) + v[:, None] * (c[tri] - a[tri])
    ).astype(np.float32)


def write_ply_ascii(path: str, points: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for p in points:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def off2ply(off_path: str, ply_path: str) -> None:
    """Vertex-only OFF→PLY conversion (view_generator.py:32-50 analog)."""
    verts, _ = read_off(off_path)
    write_ply_ascii(ply_path, verts)


def mesh_to_point_cloud_ply(
    off_path: str,
    ply_path: str,
    n_points: int = 2048,
    seed: Optional[int] = None,
) -> np.ndarray:
    """OFF mesh → sampled point cloud written as ASCII PLY (the
    ``pc_sampling`` pipeline, view_generator.py:53-69, without PCL's
    leaf-size retry loop: sampling is exact-count here)."""
    verts, faces = read_off(off_path)
    pts = sample_mesh_surface(
        verts, faces, n_points, np.random.default_rng(seed)
    )
    write_ply_ascii(ply_path, pts)
    return pts
