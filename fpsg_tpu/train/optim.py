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
    frozen_mask=None,
) -> optax.GradientTransformation:
    """Optimizer chain; ``frozen_mask`` is an optional params-shaped pytree
    of bools — True leaves get no update (the working version of the
    reference's never-called ``_set_finetune`` freeze,
    ``src/models/image_net.py:26-39``)."""
    schedule = make_lr_schedule(lr, lr_decay_epochs, steps_per_epoch)
    if sgd:
        tx = optax.chain(
            optax.add_decayed_weights(1e-2),   # torch SGD weight_decay
            optax.sgd(learning_rate=schedule),
        )
    else:
        tx = optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            param_labels=lambda params: _labels_from_mask(
                params, frozen_mask
            ),
        )
    return tx


def _labels_from_mask(params, frozen_mask):
    import jax

    return jax.tree.map(
        lambda _, frozen: "frozen" if frozen else "train",
        params, frozen_mask,
    )


def vgg_finetune_mask(params, finetune_layer: int):
    """Freeze all image-branch conv/BN blocks except the last
    ``finetune_layer`` convs — the reference's *intended* finetune behavior.

    Returns a params-shaped bool pytree (True = frozen).
    """
    import jax

    enc = params.get("img_encoder", {}).get("encoder", {})
    conv_ids = sorted(
        int(name.split("_")[1]) for name in enc
        if name.startswith("features_")
        and "kernel" in enc[name]  # convs have kernels; BN has scale/bias
    )
    keep = set(conv_ids[-finetune_layer:]) if finetune_layer > 0 else set()

    def rule(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if len(keys) >= 3 and keys[0] == "img_encoder" and keys[1] == "encoder":
            name = keys[2]
            if name.startswith("features_"):
                idx = int(name.split("_")[1])
                # a BN module at idx belongs to the conv at idx-1
                conv_idx = idx if idx in conv_ids else idx - 1
                return conv_idx not in keep
        return False

    return jax.tree_util.tree_map_with_path(rule, params)
