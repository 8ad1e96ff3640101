"""Host-resident corpus with prefetched episode assembly.

The default pipeline keeps the whole corpus in HBM (`DeviceCorpus`) — right
whenever it fits (ModelNet at 224² uint8 is ~1.4 GB). For corpora larger
than device memory, this module provides the SURVEY.md §7 fallback: the
corpus stays in host RAM, episodes are assembled by numpy in a background
thread, and a double-buffered queue overlaps H2D transfer with compute —
the reference's host-loop (trainNetwork.py:140-141) without its
synchronous stall.

Sampling semantics are identical to :func:`fpsg_tpu.data.corpus.
sample_episode_batch` (class ∝ size, without-replacement, global ad set);
the RNG is a seeded numpy generator, so runs are reproducible (unlike the
reference's global unseeded RNG).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np

from fpsg_tpu.data.corpus import ClassCorpus


def _normalize_images_np(img_u8: np.ndarray) -> np.ndarray:
    return img_u8.astype(np.float32) * (2.0 / 255.0) - 1.0


def sample_episode_batch_host(
    rng: np.random.Generator,
    corpus: ClassCorpus,
    n_support: int,
    n_query: int,
    n_episodes: int = 1,
    normalize: bool = True,
) -> dict:
    """Numpy episode assembly with DeviceCorpus-equivalent semantics.

    ``normalize=False`` keeps images uint8 for the prefetch pipeline —
    the H2D transfer then ships 1 byte/pixel instead of 4 and the
    jitted step normalizes on device (``make_host_train_step``), which
    is bitwise-identical math (same ``u8 * 2/255 - 1`` f32 formula).
    """
    counts = corpus.counts
    eligible = (
        np.ones(corpus.n_classes, bool) if corpus.eligible is None
        else np.asarray(corpus.eligible, bool)
    )
    ep_counts = np.where(eligible, counts, 0)
    probs = ep_counts / ep_counts.sum()
    flat_sizes = counts.sum()

    out = {k: [] for k in ("cls", "xs", "xq", "xad", "pcs", "pcq", "pcad")}
    # flat (class, item) table for the global ad set
    flat_cls = np.concatenate(
        [np.full(c, i, np.int32) for i, c in enumerate(counts)]
    )
    flat_item = np.concatenate([np.arange(c) for c in counts])

    for _ in range(n_episodes):
        cls = int(rng.choice(corpus.n_classes, p=probs))
        idx = rng.permutation(counts[cls])[: n_support + n_query]
        sup, qry = idx[:n_support], idx[n_support:]
        ad = rng.permutation(flat_sizes)[:n_support]

        norm = _normalize_images_np if normalize else (lambda a: a)
        out["cls"].append(cls)
        out["xs"].append(norm(corpus.images[cls][sup]))
        out["xq"].append(norm(corpus.images[cls][qry]))
        out["pcs"].append(corpus.clouds[cls][sup])
        out["pcq"].append(corpus.clouds[cls][qry])
        out["xad"].append(norm(np.stack(
            [corpus.images[flat_cls[i]][flat_item[i]] for i in ad])))
        out["pcad"].append(np.stack(
            [corpus.clouds[flat_cls[i]][flat_item[i]] for i in ad]))

    img_dtype = np.float32 if normalize else np.uint8
    return {
        "cls": np.asarray(out["cls"], np.int32),
        **{k: np.stack(out[k]).astype(img_dtype)
           for k in ("xs", "xq", "xad")},
        **{k: np.stack(out[k]).astype(np.float32)
           for k in ("pcs", "pcq", "pcad")},
    }


def prefetched_episodes(
    corpus: ClassCorpus,
    n_support: int,
    n_query: int,
    n_episodes: int = 1,
    seed: int = 0,
    buffer_size: int = 2,
    device=None,
) -> Iterator[dict]:
    """Infinite iterator of device-resident episode batches, assembled on a
    background thread (double-buffered: H2D overlaps with compute).

    Images travel uint8 (4x fewer bytes over the link than normalized
    f32); ``make_host_train_step`` normalizes on device inside the jit.
    """
    rng = np.random.default_rng(seed)
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            batch = sample_episode_batch_host(
                rng, corpus, n_support, n_query, n_episodes,
                normalize=False,
            )
            batch = {
                k: jax.device_put(v, device) for k, v in batch.items()
            }
            # Deliver THIS batch (retry on a full queue) — dropping it and
            # re-sampling would make the episode sequence depend on consumer
            # timing, breaking reproducibility and wasting H2D transfers.
            while not stop.is_set():
                try:
                    q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            yield q.get()
    finally:
        stop.set()


def make_host_train_step(model, tx, donate: bool = True):
    """Train step taking a PRE-SAMPLED episode batch (host pipeline mode);
    vmapped over the leading episode axis like the on-device step."""
    import jax.numpy as jnp
    import optax

    from fpsg_tpu.train.state import TrainState

    def episode_loss(params, batch_stats, sample, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                sample, True, mutable=["batch_stats"],
                rngs={"template": key},
            )
            return out["ttl_loss"], (out, mut["batch_stats"])

        (_, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return out, new_stats, grads

    def train_step(state: TrainState, batch, key):
        e = batch["cls"].shape[0]
        keys = jax.random.split(key, e)
        from fpsg_tpu.data.corpus import normalize_images

        sample = {
            # device-side normalize of uint8 images (the canonical
            # transform shared with sampling and serving)
            k: (normalize_images(v)
                if jnp.issubdtype(v.dtype, jnp.integer) else v)
            for k, v in batch.items() if k != "cls"
        }
        outs, new_stats, grads = jax.vmap(
            episode_loss, in_axes=(None, None, 0, 0)
        )(state.params, state.batch_stats, sample, keys)
        grads = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads)
        new_stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), new_stats)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, batch_stats=new_stats,
                       opt_state=opt_state, step=state.step + 1),
            {"query_rec_loss": outs["query_rec_loss"],
             "support_rec_loss": outs["support_rec_loss"],
             "cls": batch["cls"]},
        )

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
