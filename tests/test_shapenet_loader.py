"""ShapeNet episodic loader on a materialized fake tree."""

import os

import numpy as np
from PIL import Image

from fpsg_tpu.data.manifest import generate_shapenet_manifests
from fpsg_tpu.data.shapenet import load_shapenet_corpus


def _materialize_fake_shapenet(root, rng, synsets=("02691156", "02880940"),
                               items=3, n_raw=500):
    """Item layout: <pc_root>/<synset>/<item>/models/{npy_file.npy,images/}
    plus per-synset {id}_{split}.txt lists (shapenet.py:31-62)."""
    pc_root = os.path.join(root, "shapenet")
    for synset in synsets:
        names = []
        for i in range(items):
            name = f"item{i:03d}"
            names.append(name)
            d = os.path.join(pc_root, synset, name, "models")
            os.makedirs(os.path.join(d, "images"), exist_ok=True)
            np.save(os.path.join(d, "npy_file.npy"),
                    rng.standard_normal((n_raw, 3)).astype(np.float32))
            Image.fromarray(
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8).copy()
            ).save(os.path.join(d, "images", "v0.png"))
        with open(os.path.join(pc_root, f"{synset}_train.txt"), "w") as f:
            f.write("\n".join(names[:-1]))
        with open(os.path.join(pc_root, f"{synset}_test.txt"), "w") as f:
            f.write(names[-1])
    return pc_root


def test_shapenet_manifests_and_corpus(tmp_path, rng):
    pc_root = _materialize_fake_shapenet(str(tmp_path), rng)
    out = str(tmp_path) + "/manifests/"
    generate_shapenet_manifests(
        pc_root, out,
        train_classes=["airplane"], test_classes=["bowl"],
    )
    assert os.path.exists(out + "shapenet_train.txt")
    assert os.path.exists(out + "shapenet_files/shapenet+02691156.txt")
    with open(out + "shapenet_train.txt") as f:
        assert all("02691156" in ln for ln in f if ln.strip())

    corpus = load_shapenet_corpus(
        out + "shapenet_files/", n_pts=128,
        image_transform=lambda p: np.zeros((8, 8, 3), np.uint8),
    )
    assert sorted(corpus.class_names) == ["airplane", "bowl"]
    i = corpus.class_names.index("airplane")
    assert corpus.clouds[i].shape == (3, 128, 3)  # train+test items
    # unit-ball normalized after the 500→128 subsample
    np.testing.assert_allclose(
        np.linalg.norm(corpus.clouds[i][0], axis=1).max(), 1.0, rtol=1e-4)


def test_shapenet_subsample_seeded(tmp_path, rng):
    pc_root = _materialize_fake_shapenet(str(tmp_path), rng,
                                         synsets=("02691156",), items=1)
    out = str(tmp_path) + "/m/"
    generate_shapenet_manifests(pc_root, out, train_classes=["airplane"],
                                test_classes=[])
    tf = lambda p: np.zeros((4, 4, 3), np.uint8)
    a = load_shapenet_corpus(out + "shapenet_files/", n_pts=64,
                             image_transform=tf, seed=7)
    b = load_shapenet_corpus(out + "shapenet_files/", n_pts=64,
                             image_transform=tf, seed=7)
    np.testing.assert_array_equal(a.clouds[0], b.clouds[0])


def test_shapenet_eligibility_from_config(tmp_path, rng):
    pc_root = _materialize_fake_shapenet(str(tmp_path), rng)
    out = str(tmp_path) + "/manifests/"
    generate_shapenet_manifests(
        pc_root, out, train_classes=["airplane"], test_classes=["bowl"],
    )
    tf = lambda p: np.zeros((4, 4, 3), np.uint8)
    corpus = load_shapenet_corpus(
        out + "shapenet_files/", n_pts=64, image_transform=tf,
        config_path=out + "shapenet_train.txt",
    )
    # both classes in the corpus; only airplane episode-eligible
    assert sorted(corpus.class_names) == ["airplane", "bowl"]
    elig = dict(zip(corpus.class_names, corpus.eligible))
    assert elig["airplane"] and not elig["bowl"]
