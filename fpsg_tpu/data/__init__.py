"""Episodic data layer.

Host side: manifest generation, PLY/NPY/image readers, per-class corpus
construction (reference L3/L5 — SURVEY.md §2.5, §3.5).

Device side: the whole corpus lives in HBM as padded per-class stacks;
episode construction is pure index sampling + gathers inside the jitted
train step (replacing the reference's per-step CPU episode assembly + H2D
copy, ``src/trainNetwork.py:37-43,140-141``).
"""

from fpsg_tpu.data.readers import (
    read_ply,
    pad_and_normalize_cloud,
    augment_cloud,
    image_to_uint8,
    modelnet_image_transform,
    shapenet_image_transform,
)
from fpsg_tpu.data.corpus import ClassCorpus, DeviceCorpus, sample_episode_batch
from fpsg_tpu.data.episodes import (
    extract_episode_indices,
    EpisodicBatchSampler,
    SequentialBatchSampler,
)
from fpsg_tpu.data.synthetic import (
    synthetic_corpus,
    synthetic_device_corpus,
    materialize_fake_modelnet,
)
from fpsg_tpu.data.manifest import (
    generate_modelnet_manifests,
    generate_shapenet_manifests,
    TRAIN_SET_DIC,
    TEST_SET_DIC,
    SHAPENET_ID2NAME,
)

__all__ = [
    "read_ply",
    "pad_and_normalize_cloud",
    "augment_cloud",
    "image_to_uint8",
    "modelnet_image_transform",
    "shapenet_image_transform",
    "ClassCorpus",
    "DeviceCorpus",
    "sample_episode_batch",
    "extract_episode_indices",
    "EpisodicBatchSampler",
    "SequentialBatchSampler",
    "synthetic_corpus",
    "synthetic_device_corpus",
    "materialize_fake_modelnet",
    "generate_modelnet_manifests",
    "generate_shapenet_manifests",
    "TRAIN_SET_DIC",
    "TEST_SET_DIC",
    "SHAPENET_ID2NAME",
]
