"""Optimizer + LR schedule (reference ``src/trainNetwork.py:118-130``).

Defaults: Adam(lr, betas=(.9, .999)); ``--SGD`` switches to SGD with
weight_decay 1e-2 (torch semantics: L2 term added to the gradient).
Schedule: StepLR gamma=0.5 every ``lr_decay`` epochs, stepped per epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def scale_by_adam_compact(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam moment tracking with the moments STORED in ``moment_dtype``
    (bf16 by default) and every step computed in f32.

    Low-memory / low-bandwidth Adam: the optimizer state is the largest
    non-param HBM resident (2x params — 640 MB at the 80 M-param
    flagship), and the Adam update is HBM-bound (BASELINE.md: 612 GB/s).
    bf16 moments cut the state in half and the update's traffic from
    28 to 20 bytes/param (~1.4x on the measured pass). The recurrences
    ``mu = b1*mu + (1-b1)*g`` / ``nu = b2*nu + (1-b2)*g^2`` run on the
    f32 upcast of the stored value and round once on store, so per-step
    rounding is one bf16 quantization of each moment (relative 2^-9),
    not compounding error in the update math itself. Trajectory
    divergence vs f32 moments is bounded by
    ``tests/test_optim.py::test_bf16_moments_divergence_bound``.

    With ``moment_dtype=jnp.float32`` this is exactly
    ``optax.scale_by_adam`` (equivalence-tested).
    """

    def init(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), moment_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        f32 = lambda x: x.astype(jnp.float32)
        mu = jax.tree.map(
            lambda g, m: b1 * f32(m) + (1.0 - b1) * f32(g),
            updates, state.mu)
        nu = jax.tree.map(
            lambda g, v: b2 * f32(v) + (1.0 - b2) * jnp.square(f32(g)),
            updates, state.nu)
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v, g: ((m / bc1) / (jnp.sqrt(v / bc2) + eps)
                             ).astype(jnp.asarray(g).dtype),
            mu, nu, updates)
        store = lambda t: jax.tree.map(
            lambda x: x.astype(moment_dtype), t)
        return out, optax.ScaleByAdamState(
            count=count, mu=store(mu), nu=store(nu))

    return optax.GradientTransformation(init, update)


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
    bf16_moments: bool = False,
) -> optax.GradientTransformation:
    """Optimizer chain; ``frozen_mask`` is an optional params-shaped pytree
    of bools — True leaves get no update (the working version of the
    reference's never-called ``_set_finetune`` freeze,
    ``src/models/image_net.py:26-39``). ``bf16_moments`` switches Adam to
    bf16-stored moments (``scale_by_adam_compact``): half the optimizer
    HBM state and ~1.4x less update traffic, bounded trajectory drift
    (opt-in; default keeps exact torch-Adam f32 state for parity)."""
    schedule = make_lr_schedule(lr, lr_decay_epochs, steps_per_epoch)
    if sgd:
        tx = optax.chain(
            optax.add_decayed_weights(1e-2),   # torch SGD weight_decay
            optax.sgd(learning_rate=schedule),
        )
    elif bf16_moments:
        tx = optax.chain(
            scale_by_adam_compact(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(schedule),
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
