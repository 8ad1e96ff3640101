"""Checkpoint I/O: Orbax natively, torch-pickle interop for the reference's
shipped artifacts (SURVEY.md §5 checkpoint/resume)."""

from fpsg_tpu.io.torch_pickle import load_torch_checkpoint
from fpsg_tpu.io.convert import (
    torch_state_dict_to_flax,
    load_pretrained_pc_encoder,
    load_torchvision_vgg16_bn,
)

__all__ = [
    "load_torch_checkpoint",
    "torch_state_dict_to_flax",
    "load_pretrained_pc_encoder",
    "load_torchvision_vgg16_bn",
]
