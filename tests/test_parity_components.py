"""Parity-inventory components: PointNet heads, legacy helpers, standalone
datasets (SURVEY.md §2.3/§2.5 entries outside the main path)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.nn.pointnet_heads import (
    PointCloudFeatureExtractor,
    PointNetCls,
    PointNetDenseCls,
    TNet,
    feature_transform_regularizer,
    init_weights,
)
from fpsg_tpu.models.proto_utils import build_pc_proto, euclidean_dist


def _apply(module, x, rngs=None):
    variables = module.init(
        {"params": jax.random.PRNGKey(0), **(rngs or {})}, x, True
    )
    out, _ = module.apply(
        variables, x, True, mutable=["batch_stats"], rngs=rngs
    )
    return out


def test_tnet_identity_at_init(rng):
    """conv3 weight is zero-initialized → TNet starts closer to identity."""
    x = jnp.array(rng.standard_normal((4, 64, 3)), jnp.float32)
    out = _apply(TNet(k=3), x)
    assert out.shape == (4, 3, 3)


def test_feature_extractor_shapes(rng):
    x = jnp.array(rng.standard_normal((2, 100, 3)), jnp.float32)
    feat, trans, trans_feat = _apply(
        PointCloudFeatureExtractor(feature_transform=True), x
    )
    assert feat.shape == (2, 1024)
    assert trans.shape == (2, 3, 3)
    assert trans_feat.shape == (2, 64, 64)


def test_cls_and_dense_heads(rng):
    x = jnp.array(rng.standard_normal((2, 100, 3)), jnp.float32)
    logits, _, _ = _apply(
        PointNetCls(k=5), x, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert logits.shape == (2, 5)

    logp, _, _ = _apply(PointNetDenseCls(k=4), x)
    assert logp.shape == (2, 100, 4)
    np.testing.assert_allclose(
        np.exp(np.asarray(logp)).sum(-1), 1.0, rtol=1e-4)


def test_feature_transform_regularizer():
    eye = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
    np.testing.assert_allclose(feature_transform_regularizer(eye), 0.0,
                               atol=1e-6)
    assert float(feature_transform_regularizer(2 * eye)) > 0


def test_init_weights_registry():
    import pytest

    for name in ["normal", "xavier", "kaiming", "orthogonal"]:
        init = init_weights(name)
        w = init(jax.random.PRNGKey(0), (8, 8), jnp.float32)
        assert w.shape == (8, 8)
    with pytest.raises(NotImplementedError):
        init_weights("bogus")


def test_proto_utils(rng):
    x = jnp.array(rng.standard_normal((4, 8)), jnp.float32)
    y = jnp.array(rng.standard_normal((5, 8)), jnp.float32)
    d = euclidean_dist(x, y)
    assert d.shape == (4, 5)
    want = ((np.asarray(x)[:, None] - np.asarray(y)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d), want, rtol=1e-5)

    protos = jnp.array(rng.standard_normal((3, 8)), jnp.float32)
    labels = jnp.array([2, 0, 1])
    out = build_pc_proto(3, labels, protos)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(protos)[[2, 0, 1]])


def test_modelnet40_tree_loader(tmp_path, rng):
    from fpsg_tpu.data.pointnet_datasets import load_modelnet40_tree
    from fpsg_tpu.data.synthetic import _write_ascii_ply

    for cls in ["cube", "sphere"]:
        d = os.path.join(tmp_path, cls, "train")
        os.makedirs(d)
        for i in range(2):
            _write_ascii_ply(
                os.path.join(d, f"{i}.ply"),
                rng.standard_normal((50, 3)).astype(np.float32),
            )
    clouds, labels, c2i = load_modelnet40_tree(
        str(tmp_path), npoints=64, data_augmentation=False
    )
    assert clouds.shape == (4, 64, 3)
    assert sorted(c2i) == ["cube", "sphere"]
    np.testing.assert_allclose(
        np.linalg.norm(clouds[0], axis=1).max(), 1.0, rtol=1e-4)


def test_shapenet_part_loader(tmp_path, rng):
    from fpsg_tpu.data.pointnet_datasets import (
        get_segmentation_classes, load_shapenet_part,
    )
    import json

    synset = "12345678"
    with open(os.path.join(tmp_path, "synsetoffset2category.txt"), "w") as f:
        f.write(f"Chair\t{synset}\n")
    os.makedirs(os.path.join(tmp_path, synset, "points"))
    os.makedirs(os.path.join(tmp_path, synset, "points_label"))
    os.makedirs(os.path.join(tmp_path, "train_test_split"))
    files = []
    for i in range(3):
        uid = f"item{i}"
        np.savetxt(os.path.join(tmp_path, synset, "points", uid + ".pts"),
                   rng.standard_normal((40, 3)))
        np.savetxt(
            os.path.join(tmp_path, synset, "points_label", uid + ".seg"),
            rng.integers(1, 4, 40), fmt="%d",
        )
        files.append(f"shape_data/{synset}/{uid}")
    with open(os.path.join(tmp_path, "train_test_split",
                           "shuffled_train_file_list.json"), "w") as f:
        json.dump(files, f)

    clouds, segs, labels = load_shapenet_part(
        str(tmp_path), npoints=32, split="train", data_augmentation=False
    )
    assert clouds.shape == (3, 32, 3)
    assert segs.shape == (3, 32)
    assert (labels == 0).all()

    counts = get_segmentation_classes(
        str(tmp_path), os.path.join(tmp_path, "misc", "num_seg.txt")
    )
    assert counts["Chair"] <= 3


def test_pretrain_extra_label_filter(tmp_path, rng):
    from fpsg_tpu.data.pretrain import load_multiview_classification
    from fpsg_tpu.data.synthetic import _write_ascii_ply

    for cls in ["bed", "chair"]:
        img_d = os.path.join(tmp_path, "img", cls, "train", "item0")
        ply_d = os.path.join(tmp_path, "ply", cls, "train")
        os.makedirs(img_d), os.makedirs(ply_d)
        _write_ascii_ply(os.path.join(ply_d, "item0.ply"),
                         rng.standard_normal((30, 3)).astype(np.float32))
    clouds, labels, names = load_multiview_classification(
        os.path.join(tmp_path, "img"), os.path.join(tmp_path, "ply"),
        "train", categories=["bed", "chair"], n_pts=32,
        extra_label="chair",
    )
    assert len(clouds) == 1
    assert names == ["bed", "chair"]       # label space intact
    assert labels[0] == 1                  # chair keeps its global id
