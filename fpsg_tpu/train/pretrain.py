"""Point-cloud-encoder pretraining by supervised classification
(``src/trainPointAE.py`` — despite its name it is NOT an autoencoder:
PointNet/DGCNN features → AuxClassifier → NLL loss, SURVEY.md §2.1).

Reference bugs fixed (behavior flagged, SURVEY.md §5.1 item 6):
- ``epoch & save_interval == 0`` (bitwise-and precedence) saved only at the
  final epoch → proper modulo here;
- ``--core`` was ignored ('pointnet' hardcoded) → honored here.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from fpsg_tpu.io.checkpoints import save_checkpoint
from fpsg_tpu.models.protonet import PCEncoder
from fpsg_tpu.models.support import AuxClassifier
from fpsg_tpu.train.optim import make_optimizer
from fpsg_tpu.train.retry import is_deterministic_error, transient_cooldown
from fpsg_tpu.train.state import TrainState
from fpsg_tpu.utils.logging import RunLogger


@dataclasses.dataclass
class PretrainConfig:
    """Flag surface of trainPointAE.py (:131-153)."""

    root: str = ""
    proot: str = ""
    dataset: str = "modelnet"
    core: str = "pointnet"
    lr: float = 1e-3
    lr_decay: int = 40
    epoch: int = 150            # reference loop hardcodes range(1, 151)
    batch_size: int = 32
    val_interval: int = 10
    save_interval: int = 20
    name: str = "pretrain_pointnet"
    model_path: str = "../checkpoint"
    seed: int = 0
    n_pts: int = 2048
    transient_retries: int = 2  # exact epoch replay from a host snapshot
                                # on transient backend failures (same
                                # machinery as train/loop.py); 0 = fail fast


class PCClassifier(nn.Module):
    """PCEncoder backbone + AuxClassifier head (trainPointAE.py:60-63)."""

    core: str = "pointnet"
    num_classes: int = 10

    @nn.compact
    def __call__(self, pcs: jax.Array, train: bool) -> jax.Array:
        feat = PCEncoder(core=self.core, name="encoder")(pcs, train)
        return AuxClassifier(self.num_classes, name="classifier")(feat, train)


def nll_loss(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """torch NLLLoss on log-softmax outputs (mean over batch)."""
    return -jnp.mean(
        jnp.take_along_axis(log_probs, labels[:, None], axis=1)
    )


def make_pretrain_step(model: PCClassifier, tx):
    def step(state: TrainState, pcs, labels, key):
        def loss_fn(p):
            logp, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                pcs, True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            return nll_loss(logp, labels), (logp, mut["batch_stats"])

        (loss, (logp, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean(jnp.argmax(logp, axis=1) == labels)
        return (
            TrainState(params=params, batch_stats=new_stats,
                       opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "acc": acc},
        )

    return jax.jit(step, donate_argnums=(0,))


def make_pretrain_eval(model: PCClassifier):
    def eval_fn(state: TrainState, pcs, labels):
        logp = model.apply(state.variables, pcs, False)
        return {
            "loss": nll_loss(logp, labels),
            "acc": jnp.mean(jnp.argmax(logp, axis=1) == labels),
        }

    return jax.jit(eval_fn)


def _load_data(conf: PretrainConfig, split: str):
    if conf.dataset == "modelnet":
        from fpsg_tpu.data.pretrain import load_multiview_classification

        return load_multiview_classification(
            conf.root, conf.proot, split, n_pts=conf.n_pts, seed=conf.seed,
        )
    if conf.dataset == "shapenet":
        from fpsg_tpu.data.pretrain import load_shapenet55_classification

        return load_shapenet55_classification(
            conf.root, split, n_pts=conf.n_pts, seed=conf.seed,
        )
    if conf.dataset == "synthetic":
        from fpsg_tpu.data.pretrain import synthetic_classification

        return synthetic_classification(n_pts=conf.n_pts, seed=conf.seed)
    raise ValueError(conf.dataset)


def pretrain_pc_encoder(conf: PretrainConfig) -> Tuple[TrainState, str]:
    """Full pretraining driver (trainPointAE.py:38-129). Returns the final
    state and the saved encoder checkpoint path
    (``<model_path>/<name>/<name>_<core>``)."""
    checkpoint_path = os.path.join(conf.model_path, conf.name)
    logger = RunLogger(checkpoint_path)

    clouds, labels, class_names = _load_data(conf, "train")
    clouds_t, labels_t, _ = _load_data(conf, "test")
    logger.log(f"Avaiable Classes are: "
               f"{ {c: i for i, c in enumerate(class_names)} }")

    num_cat = len(class_names)
    model = PCClassifier(core=conf.core, num_classes=num_cat)
    # jitted init: one compile/dispatch instead of hundreds of eager ops
    # (see train/step.py:init_model)
    variables = jax.jit(lambda k1, k2, s: model.init(
        {"params": k1, "dropout": k2}, s, True))(
        jax.random.PRNGKey(conf.seed), jax.random.PRNGKey(conf.seed + 1),
        jnp.zeros((2, conf.n_pts, 3)))
    tx = make_optimizer(
        lr=conf.lr, lr_decay_epochs=conf.lr_decay,
        steps_per_epoch=max(len(clouds) // conf.batch_size, 1),
    )
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_pretrain_step(model, tx)
    eval_fn = make_pretrain_eval(model)

    d_clouds = jnp.asarray(clouds)
    d_labels = jnp.asarray(labels)
    d_clouds_t = jnp.asarray(clouds_t)
    d_labels_t = jnp.asarray(labels_t)
    rng = np.random.default_rng(conf.seed)
    key = jax.random.PRNGKey(conf.seed)
    b = conf.batch_size
    out_path = os.path.join(checkpoint_path, f"{conf.name}_{conf.core}")

    # Transient-failure resume (same design as train/loop.py): the step
    # donates its input state, so a backend flake poisons both sides of a
    # dispatch; recovery replays the epoch from a host snapshot. Both RNG
    # streams (the jax key and the numpy permutation generator) rewind
    # with it, so the replayed trajectory is bit-identical.
    retries = max(0, conf.transient_retries)
    snap = None   # (epoch, host state, jax key, numpy bit-generator state)
    attempt = 0

    epoch = 1
    while epoch <= conf.epoch:
        try:
            if retries and (snap is None or epoch != snap[0]):
                snap = (epoch, jax.device_get(state), key,
                        rng.bit_generator.state)
                attempt = 0
            perm = rng.permutation(len(clouds))
            n_batches = len(clouds) // b  # drop_last=True (trainPointAE.py:55)
            run_loss, run_acc = 0.0, 0.0
            for i in range(n_batches):
                idx = jnp.asarray(perm[i * b: (i + 1) * b])
                key, sub = jax.random.split(key)
                state, m = step(
                    state, d_clouds[idx], d_labels[idx], sub
                )
                run_loss += float(m["loss"]) * b
                run_acc += float(m["acc"]) * b
            logger.log(
                f"Running CrossEntropy is {run_loss / len(clouds)}, "
                f"Running Acc is {run_acc / len(clouds)} at Epoch {epoch}"
            )

            if epoch % conf.val_interval == 0:
                m = eval_fn(state, d_clouds_t, d_labels_t)
                logger.log(
                    f"Test CrossEntropy is {float(m['loss'])}, "
                    f"Test Accuracy is {float(m['acc'])} at Epoch {epoch}"
                )

            if epoch % conf.save_interval == 0 or epoch == conf.epoch:
                # Save the ENCODER subtree (what trainNetwork ingests).
                enc = {
                    "params": {"pc_encoder_wrap": state.params["encoder"]},
                    "batch_stats": {
                        "pc_encoder_wrap": state.batch_stats["encoder"]
                    },
                }
                save_checkpoint(out_path, enc)
                if conf.core == "pointnet":
                    # Also write the torch-format file with the reference's
                    # exact name and key layout ({name}_{core}.pt,
                    # trainPointAE.py:126) — a drop-in --pc_encoder_path for
                    # the REFERENCE trainer.
                    from fpsg_tpu.io.torch_export import export_pc_encoder

                    export_pc_encoder(
                        out_path + ".pt",
                        {
                            "params": state.params["encoder"],
                            "batch_stats": state.batch_stats["encoder"],
                        },
                    )
                logger.flush()
            epoch += 1
        except KeyboardInterrupt:
            raise
        except Exception as exc:  # noqa: BLE001 — backend transients
            if (snap is None or attempt >= retries
                    or is_deterministic_error(exc)):
                # the snapshot is a host copy — always saveable; leave a
                # resumable encoder checkpoint behind before giving up
                if snap is not None:
                    enc = {
                        "params": {
                            "pc_encoder_wrap": snap[1].params["encoder"]},
                        "batch_stats": {
                            "pc_encoder_wrap": snap[1].batch_stats["encoder"]},
                    }
                    save_checkpoint(out_path + "_crash", enc)
                    logger.log(
                        f"Interrupted at epoch {epoch}; epoch-{snap[0]} "
                        f"snapshot saved to {out_path}_crash"
                    )
                logger.flush()
                raise
            attempt += 1
            logger.log(
                f"Transient failure in pretrain epoch {epoch} "
                f"(attempt {attempt}/{retries}): {exc!r}; replaying from "
                f"the epoch-{snap[0]} snapshot"
            )
            logger.flush()
            transient_cooldown()
            epoch, host_state, key, rng_state = snap
            state = jax.device_put(host_state)
            rng = np.random.default_rng(conf.seed)
            rng.bit_generator.state = rng_state
            # device-resident data may be dead after a backend restart
            d_clouds = jnp.asarray(clouds)
            d_labels = jnp.asarray(labels)
            d_clouds_t = jnp.asarray(clouds_t)
            d_labels_t = jnp.asarray(labels_t)

    logger.flush()
    return state, out_path
