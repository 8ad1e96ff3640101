"""TPU-native compute primitives (Pallas kernels with jnp oracles).

Replaces the reference's external CUDA dependencies (SURVEY.md §2.4):

- N1 Kaolin ``chamfer_distance``      → :mod:`fpsg_tpu.ops.chamfer`
- N2 neuralnet-pytorch Sinkhorn EMD   → :mod:`fpsg_tpu.ops.emd`
- N4 DGCNN kNN top-k                  → :mod:`fpsg_tpu.ops.knn`
- shared tiled pairwise distances     → :mod:`fpsg_tpu.ops.pairwise`
"""

from fpsg_tpu.ops.pairwise import pairwise_sqdist
from fpsg_tpu.ops.chamfer import (
    chamfer_distance,
    masked_chamfer_distance,
    nearest_neighbor,
)
from fpsg_tpu.ops.emd import sinkhorn_emd, emd_wrapper
from fpsg_tpu.ops.knn import knn_indices

__all__ = [
    "pairwise_sqdist",
    "chamfer_distance",
    "masked_chamfer_distance",
    "nearest_neighbor",
    "sinkhorn_emd",
    "emd_wrapper",
    "knn_indices",
]
