"""Native C++ IO library vs the pure-Python readers."""

import os

import numpy as np
import pytest

from fpsg_tpu.data.mesh import read_off as py_read_off
from fpsg_tpu.data.readers import pad_and_normalize_cloud
from fpsg_tpu.data.readers import read_ply as py_read_ply
from fpsg_tpu.data.synthetic import _write_ascii_ply
from fpsg_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_ply_parse_matches_python(tmp_path, rng):
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    p = str(tmp_path / "a.ply")
    _write_ascii_ply(p, pts)
    a = native.read_ply(p, 2048)
    b = py_read_ply(p, 2048)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_batch_load_normalizes(tmp_path, rng):
    paths = []
    for i in range(8):
        p = str(tmp_path / f"{i}.ply")
        _write_ascii_ply(
            p, rng.standard_normal((100 + i * 50, 3)).astype(np.float32)
        )
        paths.append(p)
    out, status = native.load_ply_batch(paths, 256)
    assert (status > 0).all()
    assert out.shape == (8, 256, 3)
    for cloud in out:
        np.testing.assert_allclose(cloud.mean(0), 0, atol=1e-3)
        np.testing.assert_allclose(
            np.linalg.norm(cloud, axis=1).max(), 1.0, rtol=1e-4)


def test_normalization_matches_python_semantics(tmp_path, rng):
    """Same pad source distribution + identical center/scale math."""
    pts = rng.standard_normal((256, 3)).astype(np.float32)  # no padding
    p = str(tmp_path / "full.ply")
    _write_ascii_ply(p, pts)
    out, _ = native.load_ply_batch([p], 256)
    want = pad_and_normalize_cloud(pts, 256)
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_off_and_sampling(tmp_path):
    off = str(tmp_path / "m.off")
    with open(off, "w") as f:
        f.write("OFF\n4 2 0\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
                "3 0 1 2\n3 0 1 3\n")
    v_n, f_n = native.read_off(off)
    v_p, f_p = py_read_off(off)
    np.testing.assert_allclose(v_n, v_p)
    np.testing.assert_array_equal(f_n, f_p.astype(np.int32))
    s = native.sample_mesh(v_n, f_n, 500, seed=3)
    assert s.shape == (500, 3)
    # barycentric samples stay in the unit simplex region
    assert s.min() >= -1e-6 and s.max() <= 1 + 1e-6


def test_corpus_loader_native_path(tmp_path, rng):
    from fpsg_tpu.data import generate_modelnet_manifests, materialize_fake_modelnet
    from fpsg_tpu.data.modelnet import load_modelnet_corpus

    img_root, pc_root = materialize_fake_modelnet(
        str(tmp_path), classes=["cube"], items_per_class=3,
        n_pts=64, img_size=32,
    )
    out = str(tmp_path) + "/m/"
    generate_modelnet_manifests(img_root, pc_root, out,
                                train_classes=["cube"], test_classes=[])
    tf = lambda p: np.zeros((8, 8, 3), np.uint8)
    c_native = load_modelnet_corpus(out + "modelnet_files/", n_pts=64,
                                    image_transform=tf, use_native=True)
    c_python = load_modelnet_corpus(out + "modelnet_files/", n_pts=64,
                                    image_transform=tf, use_native=False)
    # same items; padding RNG differs (seeded differently) but clouds with
    # >= n_pts points are identical
    assert c_native.class_names == c_python.class_names
    assert c_native.clouds[0].shape == c_python.clouds[0].shape
    np.testing.assert_allclose(
        c_native.clouds[0], c_python.clouds[0], atol=1e-5)
