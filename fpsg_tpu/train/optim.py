"""Optimizer + LR schedule (reference ``src/trainNetwork.py:118-130``).

Defaults: Adam(lr, betas=(.9, .999)); ``--SGD`` switches to SGD with
weight_decay 1e-2 (torch semantics: L2 term added to the gradient).
Schedule: StepLR gamma=0.5 every ``lr_decay`` epochs, stepped per epoch.
"""

from __future__ import annotations

import optax


def make_lr_schedule(lr: float, lr_decay_epochs: int, steps_per_epoch: int):
    """lr * 0.5^(epoch // lr_decay): torch StepLR, counted in steps."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * (0.5 ** (epoch // max(lr_decay_epochs, 1)))

    return schedule


def make_optimizer(
    lr: float = 1e-3,
    sgd: bool = False,
    lr_decay_epochs: int = 350,
    steps_per_epoch: int = 100,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(lr, lr_decay_epochs, steps_per_epoch)
    if sgd:
        return optax.chain(
            optax.add_decayed_weights(1e-2),   # torch SGD weight_decay
            optax.sgd(learning_rate=schedule),
        )
    return optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8)
