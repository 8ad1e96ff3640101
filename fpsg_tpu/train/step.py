"""Jitted episodic train/eval steps.

One step = on-device episode sampling + E vmapped episode forwards/backwards
+ one optimizer update. The reference's step (SURVEY.md §3.1) crosses the
host/device boundary every episode; here the whole epoch inner loop is XLA.

Episode batching semantics: the reference runs 1 episode per optimizer step.
With ``n_episodes = E > 1`` we average E independent episode gradients (a
larger effective batch); BatchNorm batch statistics stay per-episode (vmap),
matching reference semantics exactly at E=1 and per-episode at E>1; running
stats are averaged across the episode batch (the parallel analog of the
reference's sequential updates — exact at E=1, documented divergence
otherwise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from fpsg_tpu.data.corpus import DeviceCorpus, sample_episode_batch
from fpsg_tpu.train.state import TrainState


def init_model(model, sample, seed: int = 0) -> dict:
    """Initialize model variables from a single example episode.

    Jitted: un-jitted flax init executes hundreds of EAGER ops — measured
    (round 5) ~50 s of tiny per-op XLA compiles per CLI run on the
    virtual mesh (26x `_uniform`, 116x `slice`, ...), and one eager
    dispatch per op through the axon tunnel on TPU (each a flake
    opportunity in degraded phases). One traced program is one compile
    and one dispatch."""
    def _init(k1, k2, s):
        return model.init({"params": k1, "template": k2}, s, True)

    # sample is an ARGUMENT, not a closure constant: an already-on-device
    # sample (bench: jnp.zeros) then adds zero H2D traffic
    return jax.jit(_init)(
        jax.random.PRNGKey(seed), jax.random.PRNGKey(seed + 1), sample)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    n_support: int,
    n_query: int,
    n_episodes: int = 1,
    donate: bool = True,
    mesh=None,
    steps_per_call: int = 1,
    state_shardings=None,
):
    """Build the jitted train step: (state, corpus, key) → (state, metrics).

    metrics: per-episode ``query_rec_loss`` / ``support_rec_loss`` (E,)
    plus episode class ids — the host aggregates them per class like the
    reference's epoch trackers (trainNetwork.py:139-151).

    With ``mesh``, the sampled episode batch is sharding-constrained along
    the mesh's 'dp' axis, so the E vmapped episode forwards/backwards run
    data-parallel and the gradient mean lowers to an ICI all-reduce.

    ``steps_per_call > 1`` wraps K sequential optimizer steps in ONE jit
    call via ``lax.scan`` (the corpus is device-resident and episode
    sampling is in-graph, so the inner loop is host-free). Semantics are
    identical to K separate calls with keys ``split(key, K)``; metrics come
    back stacked with a leading (K,) axis. This amortizes the per-dispatch
    host overhead (~3.5 ms through the axon tunnel, measured: wall-device
    gap in BASELINE.md) — the TPU-idiomatic replacement for the
    reference's per-episode Python loop (SURVEY.md §3.1).

    ``state_shardings`` (a TrainState-shaped NamedSharding tree, e.g.
    ``parallel.mesh.fsdp_state_sharding``) pins the state's entry AND
    exit shardings — the FSDP/ZeRO mode: params/moments stay dp-sharded
    across steps, GSPMD inserting the all-gather / reduce-scatter /
    shard-local-Adam pattern. Requires ``mesh``.
    """
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def dp_constrain(batch):
            return jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x,
                    NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1)))),
                ),
                batch,
            )
    else:
        dp_constrain = lambda b: b

    def episode_loss(params, batch_stats, sample, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                sample,
                True,
                mutable=["batch_stats"],
                rngs={"template": key},
            )
            return out["ttl_loss"], (out, mut["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return loss, out, new_stats, grads

    def train_step(state: TrainState, corpus: DeviceCorpus, key):
        k_data, k_tmpl = jax.random.split(key)
        batch = sample_episode_batch(
            k_data, corpus, n_support, n_query, n_episodes
        )
        batch = dp_constrain(batch)
        tmpl_keys = jax.random.split(k_tmpl, n_episodes)

        _, outs, new_stats, grads = jax.vmap(
            episode_loss, in_axes=(None, None, 0, 0)
        )(state.params, state.batch_stats, batch, tmpl_keys)

        # Average gradients and running-stat updates across the episode
        # batch (exact reference semantics at E=1).
        grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads)
        new_stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), new_stats)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {
            "query_rec_loss": outs["query_rec_loss"],
            "support_rec_loss": outs["support_rec_loss"],
            "cls": batch["cls"],
        }
        return new_state, metrics

    if steps_per_call > 1:
        def multi_step(state: TrainState, corpus: DeviceCorpus, key):
            def body(st, k):
                return train_step(st, corpus, k)

            keys = jax.random.split(key, steps_per_call)
            return jax.lax.scan(body, state, keys)

        fn = multi_step
    else:
        fn = train_step
    donate_argnums = (0,) if donate else ()
    if mesh is None:
        # Pin every TrainState leaf to the DEFAULT (major-to-minor)
        # layout. Left to auto layout assignment, XLA picks the decoder
        # conditioning einsum's preferred layout for the big node-MLP
        # kernels ({3,1,2,0:T(4,128)}) as the ENTRY layout of params /
        # mu / nu — while the fused Pallas decoder kernels and the Adam
        # update emit the default layout, so every step paid three
        # ~151 MB transposing copies per big weight (measured ~2.7
        # ms/step on the r3 trace, "data formatting" rows). With pinned
        # entry/exit layouts the layout flip rides the bf16 sliced
        # convert instead. Rank is per-leaf, so the Format pytree is
        # built lazily from the first state passed in.
        return _jit_with_default_state_layouts(fn, donate_argnums)
    if state_shardings is not None:
        return jax.jit(
            fn,
            donate_argnums=donate_argnums,
            in_shardings=(state_shardings, None, None),
            out_shardings=(state_shardings, None),
        )
    return jax.jit(fn, donate_argnums=donate_argnums)


def _jit_with_default_state_layouts(fn, donate_argnums):
    """jit ``fn(state, corpus, key)`` with every state leaf's entry AND
    exit layout pinned to major-to-minor (see make_train_step)."""
    from jax.experimental.layout import Format, Layout

    cache = {}

    def wrapper(state, corpus, key):
        if "jit" not in cache:
            if jax.default_backend() != "tpu":
                # Pinning layouts changes XLA:CPU fusion boundaries just
                # enough to drift the scan-vs-sequential trajectories at
                # ~1e-4; off-TPU there is nothing to win, so keep the
                # plain jit there (scan equivalence stays testably exact).
                cache["jit"] = jax.jit(fn, donate_argnums=donate_argnums)
                cache["fmt"] = None
                return cache["jit"](state, corpus, key)
            default_sharding = jax.sharding.SingleDeviceSharding(
                jax.devices()[0])

            def leaf_format(x):
                sh = getattr(x, "sharding", None) or default_sharding
                return Format(
                    Layout(tuple(range(jnp.ndim(x)))), sh)

            fmt = jax.tree.map(leaf_format, state)
            cache["fmt"] = fmt
            cache["jit"] = jax.jit(
                fn,
                donate_argnums=donate_argnums,
                in_shardings=(fmt, None, None),
                out_shardings=(fmt, None),
            )
        # jit with explicit entry layouts REJECTS committed args in any
        # other layout (it will not silently relayout). The state out of
        # init_model (or a checkpoint restore) carries whatever layouts
        # its producing computation chose, so re-lay out exactly the
        # mismatched leaves. States produced by this very step (the
        # steady case) already match and are passed through untouched —
        # device_put is NOT a no-op on matching layouts here (it
        # round-trips the axon tunnel, ~50 ms/state), so the comparison
        # is load-bearing, and passing originals keeps donation intact.
        relayouted = []

        def _relayout(x, f):
            cur = getattr(x, "format", None)
            if (cur is not None and cur.layout is not None
                    and cur.layout.major_to_minor == f.layout.major_to_minor):
                return x  # the pin only names the dim order, not tiling
            # Bounded retry: the axon backend intermittently throws bare
            # INVALID_ARGUMENT on device_put for a few seconds after a
            # tunnel hiccup (observed 2026-08-19 mid-timing-loop). The
            # copy is idempotent and nothing is donated yet, so retrying
            # here is safe — and beats killing an hours-long training
            # run over a transient (the emergency checkpoint would save
            # it, but not resume it).
            last = None
            for attempt in range(3):
                try:
                    y = jax.device_put(x, f)
                    relayouted.append(y)
                    return y
                except Exception as e:  # noqa: BLE001 — backend transient
                    last = e
                    if attempt < 2:
                        import time

                        time.sleep(5.0 * (attempt + 1))
            raise last

        if cache["fmt"] is not None:
            state = jax.tree.map(_relayout, state, cache["fmt"])
            if relayouted:
                # Load-bearing on axon (observed 2026-08-19): dispatching
                # the donating step while these relayout copies are still
                # in flight poisons the OUTPUT's layout metadata — the
                # next call then either rejects its own predecessor's
                # output ("Layout passed to jit does not match ... arg
                # layout (0,3,1,2) T(4,128)") or, if validation races
                # past, the queued execution dies at the next device read
                # with a bare INVALID_ARGUMENT. Relayouts only happen on
                # the first call after init/checkpoint-restore, so this
                # barrier costs nothing in steady state. A device→host
                # read (one element per leaf), NOT block_until_ready:
                # axon's ready events are unreliable (CLAUDE.md quirks —
                # block_until_ready does not force sync there).
                jax.device_get([r.ravel()[0] for r in relayouted])
        return cache["jit"](state, corpus, key)

    return wrapper


def make_eval_step(model, n_support: int, n_query: int, with_emd: bool = True):
    """Jitted eval on a sampled episode batch: per-episode CD (+EMD).

    Mirrors the trainer's in-loop eval (loss under no_grad,
    trainNetwork.py:157-188) and the evaluator's ``_return_reconstruction``
    path (evaluate_Network.py:101-118).
    """

    def one(variables, sample, key):
        if with_emd:
            out = model.apply(
                variables, sample, method=model.reconstruct,
                rngs={"template": key},
            )
            return {"cd_loss": out["cd_loss"], "emd_loss": out["emd_loss"]}
        out = model.apply(
            variables, sample, False, rngs={"template": key},
        )
        return {
            "cd_loss": out["query_rec_loss"],
            "support_rec_loss": out["support_rec_loss"],
        }

    def eval_step(state: TrainState, corpus: DeviceCorpus, key,
                  n_episodes: int):
        k_data, k_tmpl = jax.random.split(key)
        batch = sample_episode_batch(
            k_data, corpus, n_support, n_query, n_episodes
        )
        keys = jax.random.split(k_tmpl, n_episodes)
        out = jax.vmap(one, in_axes=(None, 0, 0))(
            state.variables, batch, keys
        )
        out["cls"] = batch["cls"]
        return out

    return jax.jit(eval_step, static_argnums=(3,))
