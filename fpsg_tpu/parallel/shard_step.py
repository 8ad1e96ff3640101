"""Explicit-collective data-parallel train step (shard_map + psum).

The default trainer expresses data parallelism implicitly (vmap over the
episode axis + a sharding constraint; XLA inserts the all-reduce). This
variant is the explicit SPMD formulation from SURVEY.md §2.6: one episode
per 'dp'-mesh device, per-device grads, gradients reduced across ICI by
``jax.lax.pmean`` — the hand-written analog of the reference's (absent)
NCCL layer. BatchNorm statistics stay per-episode by default (reference
semantics); constructing the model with ``axis_name='dp'`` switches to
cross-replica (synced) statistics through the same pmean machinery.

Both formulations are numerically equivalent (tested); the explicit one is
the template for multi-host DCN extension — the mesh axis is the only thing
that changes.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from fpsg_tpu.data.corpus import DeviceCorpus, sample_episode_batch
from fpsg_tpu.train.state import TrainState


def make_shard_map_train_step(
    model,
    tx: optax.GradientTransformation,
    n_support: int,
    n_query: int,
    mesh: Mesh,
):
    """(state, corpus, key) → (state, metrics); one episode per dp device."""
    n_dp = mesh.shape["dp"]

    def per_device(state: TrainState, corpus: DeviceCorpus, key):
        # Device-distinct episode: fold the dp coordinate into the key.
        idx = jax.lax.axis_index("dp")
        k_data, k_tmpl = jax.random.split(jax.random.fold_in(key, idx))
        batch = sample_episode_batch(k_data, corpus, n_support, n_query, 1)
        sample = jax.tree.map(lambda x: x[0], batch)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                sample, True, mutable=["batch_stats"],
                rngs={"template": k_tmpl},
            )
            return out["ttl_loss"], (out, mut["batch_stats"])

        (_, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # ICI collectives: gradient + running-stat average over 'dp'.
        grads = jax.lax.pmean(grads, "dp")
        new_stats = jax.lax.pmean(new_stats, "dp")

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, batch_stats=new_stats,
            opt_state=opt_state, step=state.step + 1,
        )
        metrics = {
            "query_rec_loss": out["query_rec_loss"][None],
            "support_rec_loss": out["support_rec_loss"][None],
            "cls": batch["cls"],
        }
        return new_state, metrics

    sharded = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P("dp")),
        check_vma=False,
    )
    return jax.jit(sharded)
