"""Procedural synthetic dataset (SURVEY.md §4: the integration fixture).

Shape classes with analytically-sampled surfaces and matching orthographic
silhouette "renders", so the image genuinely predicts the geometry:

  cube, sphere, cylinder, pyramid, torus

Two products:
- :func:`synthetic_corpus` — an in-memory :class:`ClassCorpus` for unit /
  integration tests and the benchmark harness;
- :func:`materialize_fake_modelnet` — a tiny on-disk ModelNet-format tree
  (PNG views + ASCII PLY clouds) for exercising the manifest generator and
  the real file-reading path end-to-end.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from fpsg_tpu.data.corpus import ClassCorpus

SHAPES = ("cube", "sphere", "cylinder", "pyramid", "torus")


def _sample_shape(name: str, n: int, rng: np.random.Generator) -> np.ndarray:
    if name == "sphere":
        v = rng.standard_normal((n, 3))
        return v / np.linalg.norm(v, axis=1, keepdims=True)
    if name == "cube":
        face = rng.integers(0, 6, n)
        uv = rng.uniform(-1, 1, (n, 2))
        pts = np.empty((n, 3))
        axis, sign = face // 2, (face % 2) * 2 - 1
        for i in range(n):
            rest = [a for a in range(3) if a != axis[i]]
            pts[i, axis[i]] = sign[i]
            pts[i, rest] = uv[i]
        return pts
    if name == "cylinder":
        theta = rng.uniform(0, 2 * np.pi, n)
        z = rng.uniform(-1, 1, n)
        return np.stack([np.cos(theta), z, np.sin(theta)], axis=1)
    if name == "pyramid":
        # square cross-sections shrinking linearly toward the apex
        base = rng.uniform(-1, 1, (n, 2))
        h = rng.uniform(0, 1, n)
        return np.stack(
            [base[:, 0] * (1 - h), -1 + 2 * h, base[:, 1] * (1 - h)], axis=1
        )
    if name == "torus":
        theta = rng.uniform(0, 2 * np.pi, n)
        phi = rng.uniform(0, 2 * np.pi, n)
        r, big_r = 0.3, 0.7
        return np.stack(
            [
                (big_r + r * np.cos(phi)) * np.cos(theta),
                r * np.sin(phi),
                (big_r + r * np.cos(phi)) * np.sin(theta),
            ],
            axis=1,
        )
    raise ValueError(name)


def _render_silhouette(
    points: np.ndarray, img_size: int, rng: np.random.Generator
) -> np.ndarray:
    """Orthographic splat of the (x, y) footprint onto an image, with a bit
    of shading by depth; cheap but geometry-faithful."""
    img = np.full((img_size, img_size, 3), 255, np.uint8)
    xy = points[:, :2]
    z = points[:, 2]
    uv = ((xy * 0.4 + 0.5) * (img_size - 1)).astype(int)
    uv = np.clip(uv, 0, img_size - 1)
    shade = ((z - z.min()) / (np.ptp(z) + 1e-9) * 160 + 40).astype(np.uint8)
    img[uv[:, 1], uv[:, 0]] = shade[:, None]
    return img


def synthetic_corpus(
    n_classes: int = 2,
    items_per_class: int = 12,
    n_pts: int = 2048,
    img_size: int = 224,
    seed: int = 0,
    jitter: float = 0.05,
) -> ClassCorpus:
    rng = np.random.default_rng(seed)
    names = list(SHAPES[:n_classes])
    images: List[np.ndarray] = []
    clouds: List[np.ndarray] = []
    for name in names:
        cls_imgs, cls_pcs = [], []
        for _ in range(items_per_class):
            pc = _sample_shape(name, n_pts, rng)
            scale = rng.uniform(0.7, 1.0)
            pc = pc * scale + rng.normal(0, jitter, pc.shape)
            # unit-ball normalize like the real loaders
            pc = pc - pc.mean(0, keepdims=True)
            pc = pc / max(np.linalg.norm(pc, axis=1).max(), 1e-12)
            cls_pcs.append(pc.astype(np.float32))
            cls_imgs.append(_render_silhouette(pc, img_size, rng))
        images.append(np.stack(cls_imgs))
        clouds.append(np.stack(cls_pcs))
    return ClassCorpus(class_names=names, images=images, clouds=clouds)


def synthetic_device_corpus(
    n_classes: int = 2,
    items_per_class: int = 48,
    n_pts: int = 2048,
    img_size: int = 224,
    seed: int = 0,
    jitter: float = 0.05,
):
    """Generate a synthetic :class:`DeviceCorpus` ENTIRELY on device.

    Degraded-phase armor for the benchmark preamble (BENCH_r04 died in the
    host->device corpus upload, `DeviceCorpus.build`): the synthetic bench
    corpus is random data, so there is nothing worth uploading — one jitted
    program creates the padded stacks in HBM directly and the only H2D
    traffic is the PRNG key (plus the compiled program itself).

    Geometry mirrors :func:`synthetic_corpus` in spirit: per-class
    superquadric-ish surfaces (gaussian directions normalized by a
    class-dependent p-norm — p=2 is a sphere, larger p approaches a cube),
    scale/jitter augmentation, unit-ball normalization, and an orthographic
    depth-shaded splat for the image, so the image genuinely predicts the
    geometry. Shapes/dtypes are identical to
    ``DeviceCorpus.build(synthetic_corpus(...))`` so compiled train steps
    are byte-compatible programs either way.
    """
    import jax
    import jax.numpy as jnp

    from fpsg_tpu.data.corpus import DeviceCorpus

    c, m, n, h = n_classes, items_per_class, n_pts, img_size

    @jax.jit
    def gen(key):
        kd, ks, kj = jax.random.split(key, 3)
        v = jax.random.normal(kd, (c, m, n, 3))
        # class-dependent p-norm surface: p = 2, 4, 6, ... per class
        p = 2.0 * (1.0 + jnp.arange(c, dtype=jnp.float32))
        p = p[:, None, None, None]
        norm = jnp.sum(jnp.abs(v) ** p, axis=-1, keepdims=True) ** (1.0 / p)
        pts = v / jnp.maximum(norm, 1e-12)
        scale = jax.random.uniform(ks, (c, m, 1, 1), minval=0.7, maxval=1.0)
        pts = pts * scale + jitter * jax.random.normal(kj, pts.shape)
        # unit-ball normalize like the real loaders (synthetic.py host path)
        pts = pts - jnp.mean(pts, axis=2, keepdims=True)
        r = jnp.max(jnp.linalg.norm(pts, axis=-1), axis=-1)[..., None, None]
        pts = pts / jnp.maximum(r, 1e-12)

        def render(pc):
            # orthographic splat, depth-shaded (_render_silhouette analog;
            # darker-point-wins instead of last-write-wins)
            uv = jnp.clip(
                ((pc[:, :2] * 0.4 + 0.5) * (h - 1)).astype(jnp.int32), 0,
                h - 1)
            z = pc[:, 2]
            shade = ((z - z.min()) / (jnp.ptp(z) + 1e-9) * 160.0 + 40.0)
            flat = jnp.full((h * h,), 255.0)
            flat = flat.at[uv[:, 1] * h + uv[:, 0]].min(shade)
            img = flat.reshape(h, h).astype(jnp.uint8)
            return jnp.broadcast_to(img[..., None], (h, h, 3))

        images = jax.vmap(jax.vmap(render))(pts)
        counts = jnp.full((c,), m, jnp.int32)
        return images, pts.astype(jnp.float32), counts

    # Degraded-phase armor part 2: even the PRNGKey scalar upload — the
    # first device op of a fresh process — has been observed failing
    # with the transient signature (BENCH round-5 log: INVALID_ARGUMENT
    # inside jax.random.PRNGKey). Generation is side-effect-free, so
    # retry the whole one-shot program through short bursts.
    from fpsg_tpu.train.retry import is_transient_backend_error

    last = None
    for attempt in range(4):
        try:
            images, clouds, counts = gen(jax.random.PRNGKey(seed))
            break
        except Exception as exc:  # noqa: BLE001 — backend flake
            if not is_transient_backend_error(exc):
                raise
            last = exc
            if attempt < 3:
                import time

                time.sleep(5.0 * (attempt + 1))
    else:
        raise last
    names = tuple(
        SHAPES[i % len(SHAPES)] + (f"_{i // len(SHAPES)}" if i >= len(SHAPES)
                                   else "")
        for i in range(c)
    )
    return DeviceCorpus(
        images=images, clouds=clouds, counts=counts, episode_counts=counts,
        class_names=names,
    )


def _write_ascii_ply(path: str, points: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(points)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for p in points:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def materialize_fake_modelnet(
    root: str,
    classes: Optional[Sequence[str]] = None,
    items_per_class: int = 6,
    n_pts: int = 256,
    img_size: int = 600,
    seed: int = 0,
):
    """Write a miniature ModelNet-format tree:

      <root>/images/<label>/<train|test>/<item>/<view>.png
      <root>/clouds/<label>/<train|test>/<item>.ply

    (the layout ``generate_dataset.py:64-97`` walks; 600x600 PNGs match the
    reference renderer output, phong.py:29-31). Returns (img_root, pc_root).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    classes = list(classes or SHAPES[:3])
    img_root = os.path.join(root, "images")
    pc_root = os.path.join(root, "clouds")
    for label in classes:
        for split, n_items in (("train", items_per_class),
                               ("test", max(items_per_class // 3, 1))):
            for j in range(n_items):
                item = f"{label}_{split}_{j:04d}"
                img_dir = os.path.join(img_root, label, split, item)
                ply_dir = os.path.join(pc_root, label, split)
                os.makedirs(img_dir, exist_ok=True)
                os.makedirs(ply_dir, exist_ok=True)
                pc = _sample_shape(label, n_pts, rng)
                pc = pc * rng.uniform(0.7, 1.0) + rng.normal(0, 0.03, pc.shape)
                _write_ascii_ply(
                    os.path.join(ply_dir, f"{item}.ply"), pc.astype(np.float32)
                )
                img = _render_silhouette(
                    pc / max(np.linalg.norm(pc, axis=1).max(), 1e-9),
                    img_size, rng,
                )
                Image.fromarray(img).save(os.path.join(img_dir, "v000.png"))
    return img_root, pc_root
