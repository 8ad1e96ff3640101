"""Device-resident episode corpus and on-device episode sampling.

The reference preloads every class's tensors into host RAM and assembles
episodes on the CPU each step, then copies six tensors H2D
(``src/datasets/modelnet.py:130-153``, ``src/trainNetwork.py:37-43``). On
TPU that per-step host round-trip would dominate; instead the whole corpus
lives in HBM as padded per-class stacks and episode construction is index
sampling + ``take`` gathers *inside* the jitted step (SURVEY.md §2.6 item 3).

Ragged class sizes are padded to the max class size with a validity count;
without-replacement sampling over a ragged prefix uses the random-key top-k
trick (invalid slots get -inf priority).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ClassCorpus:
    """Host-side per-class data (numpy), ragged.

    ``eligible`` marks classes episodes may be drawn from. The reference
    loads ALL per-class manifests into its reference dict / ad-set corpus
    (modelnet.py:130-153) but only items of the ``--config_path`` manifest
    seed episodes (modelnet.py:110-112) — so the ad set can span classes the
    episode sampler never picks.
    """

    class_names: List[str]
    images: List[np.ndarray]   # per class: (n_i, H, W, 3) uint8
    clouds: List[np.ndarray]   # per class: (n_i, N, 3) float32
    eligible: Optional[np.ndarray] = None  # (C,) bool; default all True

    @property
    def n_classes(self) -> int:
        return len(self.class_names)

    @property
    def counts(self) -> np.ndarray:
        return np.array([len(c) for c in self.clouds], np.int32)


@flax.struct.dataclass
class DeviceCorpus:
    """Padded stacks, device-resident (or shardable). A pytree, so it flows
    through jit/vmap; ``class_names`` is static metadata."""

    images: jax.Array          # (C, M, H, W, 3) uint8
    clouds: jax.Array          # (C, M, N, 3) float32
    counts: jax.Array          # (C,) int32 — valid items per class
    episode_counts: jax.Array  # (C,) int32 — counts where eligible else 0
    class_names: tuple = flax.struct.field(pytree_node=False, default=())

    @staticmethod
    def build(corpus: ClassCorpus, device=None) -> "DeviceCorpus":
        counts = corpus.counts
        m = int(counts.max())
        c = corpus.n_classes
        eligible = (
            np.ones(c, bool) if corpus.eligible is None
            else np.asarray(corpus.eligible, bool)
        )
        img_shape = corpus.images[0].shape[1:]
        pc_shape = corpus.clouds[0].shape[1:]
        images = np.zeros((c, m) + img_shape, np.uint8)
        clouds = np.zeros((c, m) + pc_shape, np.float32)
        for i, (im, pc) in enumerate(zip(corpus.images, corpus.clouds)):
            images[i, : len(im)] = im
            clouds[i, : len(pc)] = pc
        put0 = (lambda x: jax.device_put(x, device)) if device \
            else jnp.asarray

        def put(x):
            # Host->device uploads through the axon tunnel fail in
            # bursts with bare `INVALID_ARGUMENT: TPU backend error`
            # (CLAUDE.md platform quirks; observed 2026-08-20 failing
            # the corpus upload specifically while other transfers in
            # neighboring processes succeeded). The upload is free of
            # side effects — retry in place with a short cool-down
            # before bubbling up to the coarser loop-level armor.
            from fpsg_tpu.train.retry import is_transient_backend_error

            last = None
            for attempt in range(4):
                try:
                    return put0(x)
                except Exception as exc:  # noqa: BLE001 — backend flake
                    if not is_transient_backend_error(exc):
                        raise
                    last = exc
                    if attempt < 3:
                        import time

                        time.sleep(5.0 * (attempt + 1))
            raise last

        return DeviceCorpus(
            images=put(images),
            clouds=put(clouds),
            counts=put(counts),
            episode_counts=put(np.where(eligible, counts, 0).astype(np.int32)),
            class_names=tuple(corpus.class_names),
        )

    @property
    def total_items(self) -> int:
        return int(np.asarray(self.counts).sum())


def normalize_images(img_u8: jax.Array) -> jax.Array:
    """ToTensor + Normalize((.5,)*3, (.5,)*3): uint8 → [-1, 1] f32.

    THE canonical device-side image transform (generate_dataset.py
    normalization) — training sampling, the host pipeline's on-device
    leg, and serving all call this one definition so they cannot
    drift.
    """
    return img_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0


def _sample_without_replacement(key, count, max_count, k):
    """k distinct indices uniform over [0, count) via random-priority top-k."""
    pri = jax.random.uniform(key, (max_count,))
    valid = jnp.arange(max_count) < count
    pri = jnp.where(valid, pri, -jnp.inf)
    _, idx = jax.lax.top_k(pri, k)
    return idx


def sample_episode_batch(
    key: jax.Array,
    corpus: DeviceCorpus,
    n_support: int,
    n_query: int,
    n_episodes: int = 1,
):
    """Sample a batch of 1-way episodes entirely on device.

    Episode semantics match the reference exactly:
    - the episode class is the class of a uniformly-drawn item, so class
      probability is proportional to class size (``EpisodicBatchSampler``,
      datasets/utils.py:31-42 + modelnet.py:110-112);
    - support/query indices drawn without replacement within the class
      (``extract_episode``, datasets/utils.py:4-28);
    - the ad set is ``n_support`` distinct items from the global cross-class
      corpus (modelnet.py:124-127).

    Returns a dict of arrays with leading episode axis E:
      xs/xq/xad: (E, S|Q|S, H, W, 3) f32 in [-1, 1]
      pcs/pcq/pcad: (E, S|Q|S, N, 3) f32
      cls: (E,) int32 episode class ids
    """
    counts = corpus.counts
    c = corpus.images.shape[0]
    m = corpus.images.shape[1]

    def one_episode(ekey):
        k_cls, k_sq, k_ad = jax.random.split(ekey, 3)
        # Uniform item over the episode-eligible corpus → its class.
        ep_counts = corpus.episode_counts
        total = jnp.sum(ep_counts)
        flat = jax.random.randint(k_cls, (), 0, total)
        cum = jnp.cumsum(ep_counts)
        cls = jnp.sum(flat >= cum)  # first class with cum > flat

        idx = _sample_without_replacement(
            k_sq, counts[cls], m, n_support + n_query
        )
        sup_idx, qry_idx = idx[:n_support], idx[n_support:]

        imgs_c = corpus.images[cls]
        pcs_c = corpus.clouds[cls]
        xs = normalize_images(imgs_c[sup_idx])
        xq = normalize_images(imgs_c[qry_idx])
        pcs = pcs_c[sup_idx]
        pcq = pcs_c[qry_idx]

        # Ad set: distinct global items (class-padded 2-d index space).
        pri = jax.random.uniform(k_ad, (c, m))
        valid = jnp.arange(m)[None, :] < counts[:, None]
        pri = jnp.where(valid, pri, -jnp.inf)
        _, flat_idx = jax.lax.top_k(pri.reshape(-1), n_support)
        ad_cls, ad_item = flat_idx // m, flat_idx % m
        xad = normalize_images(corpus.images[ad_cls, ad_item])
        pcad = corpus.clouds[ad_cls, ad_item]

        return {
            "cls": cls.astype(jnp.int32),
            "xs": xs, "xq": xq, "xad": xad,
            "pcs": pcs, "pcq": pcq, "pcad": pcad,
        }

    keys = jax.random.split(key, n_episodes)
    return jax.vmap(one_episode)(keys)


def sequential_episode(
    corpus: DeviceCorpus,
    cls: int,
    item: int,
    key: jax.Array,
    n_support: int,
    n_query: int = 1,
):
    """Deterministic-item episode for sequential eval: the given (cls, item)
    is the query; support/ad drawn from key.

    Intentional divergence (PARITY.md §5.1): the reference's sequential
    sampler only selects the CLASS by index — the query is then a random
    item of that class (datasets/utils.py:45-54 + extract_episode randperm).
    Here the indexed item itself is the query, so a sequential eval visits
    every test item exactly once (deterministic, better coverage)."""
    counts = corpus.counts
    m = corpus.images.shape[1]
    c = corpus.images.shape[0]
    k_s, k_ad = jax.random.split(key)
    del n_query  # one query: the indexed item (documented divergence above)

    # Support: distinct items of cls, excluding the query item.
    pri = jax.random.uniform(k_s, (m,))
    valid = (jnp.arange(m) < counts[cls]) & (jnp.arange(m) != item)
    _, sup_idx = jax.lax.top_k(jnp.where(valid, pri, -jnp.inf), n_support)

    imgs_c = corpus.images[cls]
    pcs_c = corpus.clouds[cls]

    pri_ad = jax.random.uniform(k_ad, (c, m))
    valid_ad = jnp.arange(m)[None, :] < counts[:, None]
    _, flat_idx = jax.lax.top_k(
        jnp.where(valid_ad, pri_ad, -jnp.inf).reshape(-1), n_support
    )
    ad_cls, ad_item = flat_idx // m, flat_idx % m

    return {
        "cls": jnp.asarray(cls, jnp.int32),
        "xs": normalize_images(imgs_c[sup_idx]),
        "xq": normalize_images(imgs_c[item][None]),
        "xad": normalize_images(corpus.images[ad_cls, ad_item]),
        "pcs": pcs_c[sup_idx],
        "pcq": pcs_c[item][None],
        "pcad": corpus.clouds[ad_cls, ad_item],
    }
