"""Template surfaces for the shape-primitive decoder.

The reference samples template points with in-place CUDA RNG
(``src/models/utils.py:15-96``); here sampling is explicit ``jax.random``
with threaded keys so episodes are reproducible, and regular points are
generated host-side in numpy (replacing the PyMesh C++ dependency,
SURVEY.md §2.4 N5).

Known reference bug (SURVEY.md §5.1 item 4): ``ShpereTemplate.
get_random_points`` discards its normalization (``utils.py:32``), producing
gaussian — not unit-sphere — samples. We default to the *intended* behavior
(normalized); pass ``faithful_bug=True`` for bit-parity with the shipped
code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SquareTemplate:
    """Uniform samples on the unit square [0,1)^2 (utils.py:45-54)."""

    dim = 2

    @staticmethod
    def get_random_points(key: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
        """shape is (..., dim=2) points-last; returns uniform [0,1)."""
        return jax.random.uniform(key, shape, jnp.float32)

    @staticmethod
    def get_regular_points(npoints: int = 2048) -> np.ndarray:
        """Regular grid on the unit square, (grain+1)^2 >= npoints vertices.

        Mirrors ``SquareTemplate.generate_square`` (utils.py:56-85) which
        builds a (sqrt(npoints))^2 vertex grid and returns its 2-d vertices.
        """
        grain = int(np.sqrt(npoints)) - 1
        ii, jj = np.meshgrid(
            np.arange(grain + 1), np.arange(grain + 1), indexing="ij"
        )
        verts = np.stack([ii / grain, jj / grain], axis=-1).reshape(-1, 2)
        return verts.astype(np.float32)


class SphereTemplate:
    """Gaussian directions, normalized to the unit sphere (intended
    behavior of utils.py:24-43)."""

    dim = 3

    @staticmethod
    def get_random_points(
        key: jax.Array,
        shape: Tuple[int, ...],
        faithful_bug: bool = False,
    ) -> jax.Array:
        g = jax.random.normal(key, shape, jnp.float32)
        if faithful_bug:
            # Reference drops the normalization result (utils.py:32).
            return g
        return g / jnp.sqrt(
            jnp.sum(g * g, axis=-1, keepdims=True) + 1e-12
        )

    @staticmethod
    def get_regular_points(subdiv: int = 4) -> np.ndarray:
        """Icosphere vertices (pymesh.generate_icosphere(1, 0, 4) analog)."""
        return icosphere_vertices(subdiv)


def icosphere_vertices(subdiv: int) -> np.ndarray:
    """Unit icosphere vertices by repeated edge subdivision (numpy)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    for _ in range(subdiv):
        edge_mid = {}
        new_faces = []
        vlist = list(verts)

        def midpoint(a, b):
            k = (min(a, b), max(a, b))
            if k not in edge_mid:
                m = (vlist[a] + vlist[b]) / 2.0
                m /= np.linalg.norm(m)
                edge_mid[k] = len(vlist)
                vlist.append(m)
            return edge_mid[k]

        for f in faces:
            a, b, c = int(f[0]), int(f[1]), int(f[2])
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.array(vlist)
        faces = np.array(new_faces, np.int64)
    return verts.astype(np.float32)


_TEMPLATES = {"SQUARE": SquareTemplate, "SPHERE": SphereTemplate}


def get_template(template_type: str):
    """Factory mirroring ``get_template`` (utils.py:90-96)."""
    try:
        return _TEMPLATES[template_type]
    except KeyError:
        raise ValueError(f"Invalid template: {template_type}")
