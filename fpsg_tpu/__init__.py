"""fpsg_tpu — a TPU-native few-shot point-cloud generation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of voidstrike/FPSG
(ACM MM 2021: "Generating Point Cloud from Single Image in the Few Shot
Scenario"). The reference is a single-GPU PyTorch research repo whose
performance-critical primitives live in external CUDA deps (Kaolin Chamfer,
neuralnet-pytorch EMD, cuDNN); here every one of those is a first-party
TPU-native implementation:

- ``fpsg_tpu.ops``      — Pallas kernels + jnp oracles: Chamfer, Sinkhorn-EMD,
                          kNN/top-k, tiled pairwise distances.
- ``fpsg_tpu.nn``       — backbones (PointNet w/ STN, DGCNN EdgeConv, VGG16-bn)
                          and the fused (vmapped) shape-primitive decoder.
- ``fpsg_tpu.models``   — the ImgPCProtoNet-equivalent episodic model.
- ``fpsg_tpu.data``     — manifests, readers, device-resident episode corpus,
                          episodic samplers.
- ``fpsg_tpu.parallel`` — device-mesh episode data-parallelism (shard_map /
                          pjit; psum grads, cross-replica BN).
- ``fpsg_tpu.train``    — jitted train/eval steps, optimizer, loops.
- ``fpsg_tpu.io``       — Orbax checkpoints + torch-pickle interop (no torch
                          dependency) for the reference's shipped encoders.
- ``fpsg_tpu.cli``      — flag-compatible drivers (trainNetwork,
                          evaluate_Network, trainPointAE, generate_dataset).

Reference layout/behavior citations use ``/root/reference`` file:line paths.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences (keeps `import fpsg_tpu` light)."""
    if name == "FPSGConfig":
        from fpsg_tpu.config import FPSGConfig

        return FPSGConfig
    if name == "ImgPCProtoNet":
        from fpsg_tpu.models import ImgPCProtoNet

        return ImgPCProtoNet
    if name == "Generator":
        from fpsg_tpu.serve import Generator

        return Generator
    if name == "train_network":
        from fpsg_tpu.train.loop import train_network

        return train_network
    if name == "evaluate_network":
        from fpsg_tpu.train.loop import evaluate_network

        return evaluate_network
    raise AttributeError(f"module 'fpsg_tpu' has no attribute {name!r}")
