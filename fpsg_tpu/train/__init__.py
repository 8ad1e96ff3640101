"""Jitted train/eval steps, optimizer chain, training loop."""

from fpsg_tpu.train.optim import make_optimizer
from fpsg_tpu.train.state import TrainState
from fpsg_tpu.train.step import make_train_step, make_eval_step, init_model

__all__ = [
    "make_optimizer",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "init_model",
]
