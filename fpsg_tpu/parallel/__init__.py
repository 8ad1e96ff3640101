"""Device-mesh parallelism (SURVEY.md §2.6).

The reference is strictly single-process/single-GPU; the TPU-native
equivalents defined here are:

- **episode data-parallelism (dp)**: the episode batch axis is sharded over
  the mesh; gradients are reduced by the mean over episodes, which XLA
  lowers to ICI all-reduces (the NCCL replacement).
- **primitive model-parallelism (mp)**: the decoder's stacked per-cluster /
  per-node weights (~62 M of the ~80 M params) shard naturally along the
  cluster axis; encoders stay replicated.
- cross-replica BatchNorm (``axis_name`` pmean) is available in every
  module for synced-stats mode.
- **point-axis sharding (sp)**: clouds larger than one chip — ring
  chamfer + point-sharded encoding (:mod:`fpsg_tpu.parallel.sp`).
- **pipeline parallelism (pp)**: models deeper than one chip — GPipe
  microbatch schedule over ``ppermute`` (:mod:`fpsg_tpu.parallel.pp`);
  a capability axis here (no 'ep' exists: the reference has no MoE).
"""

from fpsg_tpu.parallel.mesh import (
    make_mesh,
    shard_train_state,
    shard_episode_batch,
    replicate,
    param_sharding_rules,
    fsdp_state_sharding,
)
from fpsg_tpu.parallel.sp import (
    chamfer_distance_sp,
    ring_chamfer,
    ring_nn_sq,
)
from fpsg_tpu.parallel.pp import (
    make_pp_mesh,
    pipeline_repeated,
    pipeline_stages,
    stack_stage_params,
)

__all__ = [
    "make_pp_mesh",
    "pipeline_repeated",
    "pipeline_stages",
    "stack_stage_params",
    "make_mesh",
    "shard_train_state",
    "shard_episode_batch",
    "replicate",
    "param_sharding_rules",
    "fsdp_state_sharding",
    "chamfer_distance_sp",
    "ring_chamfer",
    "ring_nn_sq",
]
