"""Data layer: readers, corpus, on-device episode sampling, manifests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.data import (
    ClassCorpus,
    DeviceCorpus,
    EpisodicBatchSampler,
    SequentialBatchSampler,
    extract_episode_indices,
    generate_modelnet_manifests,
    materialize_fake_modelnet,
    pad_and_normalize_cloud,
    read_ply,
    sample_episode_batch,
    synthetic_corpus,
)
from fpsg_tpu.data.modelnet import load_modelnet_corpus


def test_pad_and_normalize(rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32) * 5
    out = pad_and_normalize_cloud(pts, 256, rng)
    assert out.shape == (256, 3)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1).max(), 1.0,
                               rtol=1e-5)


def test_extract_episode_indices(rng):
    g = np.random.default_rng(0)
    sup, qry = extract_episode_indices(g, 20, 5, 3)
    assert len(sup) == 5 and len(qry) == 3
    assert len(set(sup) | set(qry)) == 8  # disjoint, no repeats
    sup, qry = extract_episode_indices(g, 20, 5, -1)
    assert len(qry) == 15  # rest of class


def test_samplers():
    ep = EpisodicBatchSampler(50, 1, 7, seed=0)
    batches = list(ep)
    assert len(batches) == 7 and all(len(b) == 1 for b in batches)
    seq = SequentialBatchSampler(5)
    assert [int(b[0]) for b in seq] == [0, 1, 2, 3, 4]


def test_synthetic_corpus_and_device_sampling(rng):
    corpus = synthetic_corpus(n_classes=3, items_per_class=10, n_pts=64,
                              img_size=32)
    dev = DeviceCorpus.build(corpus)
    batch = sample_episode_batch(
        jax.random.PRNGKey(0), dev, n_support=4, n_query=2, n_episodes=3
    )
    assert batch["xs"].shape == (3, 4, 32, 32, 3)
    assert batch["xq"].shape == (3, 2, 32, 32, 3)
    assert batch["pcs"].shape == (3, 4, 64, 3)
    assert batch["pcq"].shape == (3, 2, 64, 3)
    assert batch["xad"].shape == (3, 4, 32, 32, 3)
    # normalized to [-1, 1]
    assert float(batch["xs"].max()) <= 1.0
    assert float(batch["xs"].min()) >= -1.0
    # valid class ids
    cls = np.asarray(batch["cls"])
    assert ((cls >= 0) & (cls < 3)).all()


def test_episode_class_consistency(rng):
    """All support/query items of an episode must come from one class —
    checkable because synthetic classes have very different shapes."""
    corpus = synthetic_corpus(n_classes=2, items_per_class=8, n_pts=128,
                              img_size=16, jitter=0.0)
    dev = DeviceCorpus.build(corpus)
    batch = sample_episode_batch(
        jax.random.PRNGKey(1), dev, n_support=3, n_query=2, n_episodes=8
    )
    # nearest-corpus-item class of each sampled cloud == episode class
    flat = np.concatenate([np.asarray(c) for c in corpus.clouds])
    labels = np.concatenate(
        [np.full(len(c), i) for i, c in enumerate(corpus.clouds)]
    )
    for e in range(8):
        for pc in np.asarray(batch["pcs"][e]):
            d = ((flat - pc[None]) ** 2).sum((1, 2))
            assert labels[d.argmin()] == int(batch["cls"][e])


def test_eligibility_mask(rng):
    corpus = synthetic_corpus(n_classes=3, items_per_class=6, n_pts=32,
                              img_size=16)
    corpus.eligible = np.array([True, False, True])
    dev = DeviceCorpus.build(corpus)
    batch = sample_episode_batch(
        jax.random.PRNGKey(2), dev, n_support=2, n_query=1, n_episodes=32
    )
    assert not (np.asarray(batch["cls"]) == 1).any()


def test_without_replacement(rng):
    """Support/query indices within an episode never repeat an item."""
    corpus = synthetic_corpus(n_classes=1, items_per_class=7, n_pts=32,
                              img_size=16)
    dev = DeviceCorpus.build(corpus)
    batch = sample_episode_batch(
        jax.random.PRNGKey(3), dev, n_support=4, n_query=3, n_episodes=16
    )
    for e in range(16):
        clouds = np.concatenate(
            [np.asarray(batch["pcs"][e]), np.asarray(batch["pcq"][e])]
        )
        # pairwise-distinct clouds (items are distinct by construction)
        d = ((clouds[:, None] - clouds[None]) ** 2).sum((-1, -2))
        off_diag = d + np.eye(len(d)) * 1e9
        assert off_diag.min() > 1e-8


def test_fake_modelnet_end_to_end(tmp_path, rng):
    """Full host path: materialize files → manifests → corpus loader."""
    img_root, pc_root = materialize_fake_modelnet(
        str(tmp_path), classes=["cube", "sphere"], items_per_class=4,
        n_pts=128, img_size=64,
    )
    out = str(tmp_path) + "/manifests/"
    generate_modelnet_manifests(
        img_root, pc_root, out,
        train_classes=["cube"], test_classes=["sphere"],
    )
    assert os.path.exists(out + "modelnet_train.txt")
    assert os.path.exists(out + "modelnet_files/modelnet+cube.txt")

    # PLY reader on real files
    with open(out + "modelnet_files/modelnet+cube.txt") as f:
        _, ply = f.readline().strip().split("\t")
    pts = read_ply(ply)
    assert pts.shape == (128, 3)

    corpus = load_modelnet_corpus(
        out + "modelnet_files/", n_pts=128,
        image_transform=lambda p: np.zeros((8, 8, 3), np.uint8),
        config_path=out + "modelnet_train.txt",
    )
    assert corpus.class_names == ["cube", "sphere"]
    assert list(corpus.eligible) == [True, False]  # only cube in train
    assert corpus.clouds[0].shape == (5, 128, 3)  # 4 train + 1 test item


def test_episode_class_distribution_matches_class_sizes(rng):
    """Class draw probability proportional to class size (the reference's
    EpisodicBatchSampler picks a random ITEM whose class seeds the
    episode)."""
    corpus = synthetic_corpus(n_classes=2, items_per_class=8, n_pts=16,
                              img_size=8)
    # make class 0 3x bigger
    corpus.clouds[0] = np.tile(corpus.clouds[0], (3, 1, 1))
    corpus.images[0] = np.tile(corpus.images[0], (3, 1, 1, 1))
    dev = DeviceCorpus.build(corpus)
    batch = sample_episode_batch(
        jax.random.PRNGKey(0), dev, n_support=2, n_query=1, n_episodes=512
    )
    frac0 = float((np.asarray(batch["cls"]) == 0).mean())
    assert 0.65 < frac0 < 0.85, frac0  # expected 0.75
