"""Backbones and the shape-primitive decoder (flax.linen, TPU-first).

All 1x1 Conv1d stacks from the reference become Dense layers over a
channels-last layout — on TPU a 1x1 conv IS a matmul, and channels-last
keeps the contraction on the MXU without layout transposes.
"""

from fpsg_tpu.nn.normalization import BatchNorm
from fpsg_tpu.nn.pointnet import STN3d, STNkd, PointNetFeat, PointNetEncoder
from fpsg_tpu.nn.dgcnn import DGCNNFeat
from fpsg_tpu.nn.vgg import VGG16BN, TinyImageEncoder, ImageEncoder
from fpsg_tpu.nn.decoder import PrimitiveDecoder
from fpsg_tpu.nn.templates import SquareTemplate, SphereTemplate, get_template

__all__ = [
    "BatchNorm",
    "STN3d",
    "STNkd",
    "PointNetFeat",
    "PointNetEncoder",
    "DGCNNFeat",
    "VGG16BN",
    "TinyImageEncoder",
    "ImageEncoder",
    "PrimitiveDecoder",
    "SquareTemplate",
    "SphereTemplate",
    "get_template",
]
