"""Episodic few-shot generation models (pure-function style over flax)."""

from fpsg_tpu.models.protonet import ImgPCProtoNet, PCEncoder
from fpsg_tpu.models.support import AuxClassifier, FCMaskAllocater

__all__ = ["ImgPCProtoNet", "PCEncoder", "AuxClassifier", "FCMaskAllocater"]
