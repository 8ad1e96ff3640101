"""Host-prefetch pipeline: semantics match the device sampler; training
works through the prefetched iterator."""

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.data import synthetic_corpus
from fpsg_tpu.data.host_pipeline import (
    make_host_train_step,
    prefetched_episodes,
    sample_episode_batch_host,
)


def test_host_sampling_semantics(rng):
    corpus = synthetic_corpus(n_classes=2, items_per_class=8, n_pts=64,
                              img_size=16, jitter=0.0)
    g = np.random.default_rng(0)
    batch = sample_episode_batch_host(g, corpus, n_support=3, n_query=2,
                                      n_episodes=6)
    assert batch["xs"].shape == (6, 3, 16, 16, 3)
    assert batch["pcq"].shape == (6, 2, 64, 3)
    assert batch["xs"].min() >= -1.0 and batch["xs"].max() <= 1.0
    # class consistency: support clouds belong to the episode class
    flat = np.concatenate(corpus.clouds)
    labels = np.concatenate(
        [np.full(len(c), i) for i, c in enumerate(corpus.clouds)])
    for e in range(6):
        for pc in batch["pcs"][e]:
            d = ((flat - pc[None]) ** 2).sum((1, 2))
            assert labels[d.argmin()] == batch["cls"][e]
    # support/query disjoint (distinct items)
    for e in range(6):
        clouds = np.concatenate([batch["pcs"][e], batch["pcq"][e]])
        d = ((clouds[:, None] - clouds[None]) ** 2).sum((-1, -2))
        assert (d + np.eye(len(d)) * 1e9).min() > 1e-8


def test_uint8_transfer_path_is_bitwise_equal(rng):
    """The prefetch pipeline ships uint8 (4x fewer H2D bytes) and the
    step normalizes on device — bitwise-identical f32 to host-side
    normalization (same u8 * 2/255 - 1 formula)."""
    corpus = synthetic_corpus(n_classes=2, items_per_class=8, n_pts=64,
                              img_size=16, jitter=0.0)
    f32 = sample_episode_batch_host(
        np.random.default_rng(7), corpus, 3, 2, n_episodes=4)
    u8 = sample_episode_batch_host(
        np.random.default_rng(7), corpus, 3, 2, n_episodes=4,
        normalize=False)
    for k in ("xs", "xq", "xad"):
        assert u8[k].dtype == np.uint8
        dev = np.asarray(
            jnp.asarray(u8[k]).astype(jnp.float32) * (2.0 / 255.0) - 1.0)
        np.testing.assert_array_equal(dev, f32[k])
    for k in ("pcs", "pcq", "pcad", "cls"):
        np.testing.assert_array_equal(u8[k], f32[k])


def test_eligibility_respected(rng):
    corpus = synthetic_corpus(n_classes=3, items_per_class=6, n_pts=32,
                              img_size=8)
    corpus.eligible = np.array([True, False, True])
    g = np.random.default_rng(1)
    batch = sample_episode_batch_host(g, corpus, 2, 1, n_episodes=32)
    assert not (batch["cls"] == 1).any()


def test_prefetched_training_runs(rng):
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.train import TrainState, init_model, make_optimizer

    corpus = synthetic_corpus(n_classes=2, items_per_class=8, n_pts=64,
                              img_size=16)
    model = ImgPCProtoNet(img_backbone="tiny", num_clusters=2, num_nodes=2,
                          num_points=64, bottleneck_size=1536)
    sample = {k: jnp.zeros(s) for k, s in {
        "xs": (3, 16, 16, 3), "xq": (1, 16, 16, 3), "xad": (3, 16, 16, 3),
        "pcs": (3, 64, 3), "pcq": (1, 64, 3), "pcad": (3, 64, 3)}.items()}
    variables = init_model(model, sample)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=4)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_host_train_step(model, tx, donate=False)

    it = prefetched_episodes(corpus, n_support=3, n_query=1, n_episodes=2,
                             seed=0)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(8):
        batch = next(it)
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        losses.append(float(jnp.mean(m["query_rec_loss"])))
    it.close()
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
