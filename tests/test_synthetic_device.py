"""On-device synthetic corpus (bench preamble armor, VERDICT r4 item 2).

The benchmark's corpus must be generated ON DEVICE so a degraded axon
phase cannot kill the preamble in a host->device upload (BENCH_r04 died
exactly there). These tests pin that `synthetic_device_corpus` is a
drop-in for `DeviceCorpus.build(synthetic_corpus(...))`: identical
shapes/dtypes (so compiled train steps are the same program), sane
geometry statistics, and compatibility with on-device episode sampling.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.data import (
    DeviceCorpus,
    sample_episode_batch,
    synthetic_corpus,
    synthetic_device_corpus,
)


def _small(**kw):
    return dict(n_classes=2, items_per_class=5, n_pts=128, img_size=32, **kw)


def test_matches_host_corpus_shapes_and_dtypes():
    dev = synthetic_device_corpus(**_small())
    host = DeviceCorpus.build(synthetic_corpus(**_small()))
    for field in ("images", "clouds", "counts", "episode_counts"):
        a, b = getattr(dev, field), getattr(host, field)
        assert a.shape == b.shape, field
        assert a.dtype == b.dtype, field
    assert np.array_equal(np.asarray(dev.counts), np.asarray(host.counts))
    assert len(dev.class_names) == len(host.class_names)


def test_geometry_statistics():
    dev = synthetic_device_corpus(**_small())
    pc = np.asarray(dev.clouds)
    r = np.linalg.norm(pc, axis=-1)
    # unit-ball normalized: max radius exactly 1 per cloud, centered
    np.testing.assert_allclose(r.max(axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(pc.mean(axis=2), 0.0, atol=1e-5)
    img = np.asarray(dev.images)
    # depth-shaded splat on a white background: both present
    assert (img == 255).mean() > 0.5
    assert (img < 255).mean() > 0.005
    # classes are geometrically distinct (p-norm family): mean radius of
    # the pre-normalization surface differs => post-norm radial spread
    # differs between the sphere (p=2) and the boxier p=4 class
    assert abs(r[0].std() - r[1].std()) > 1e-4


def test_feeds_episode_sampler():
    dev = synthetic_device_corpus(**_small())
    batch = sample_episode_batch(
        jax.random.PRNGKey(0), dev, n_support=3, n_query=1, n_episodes=2)
    assert batch["xs"].shape == (2, 3, 32, 32, 3)
    assert batch["pcs"].shape == (2, 3, 128, 3)
    assert batch["xs"].dtype == jnp.float32
    xs = np.asarray(batch["xs"])
    assert xs.min() >= -1.0 - 1e-6 and xs.max() <= 1.0 + 1e-6


def test_deterministic_in_seed():
    a = synthetic_device_corpus(**_small(seed=7))
    b = synthetic_device_corpus(**_small(seed=7))
    c = synthetic_device_corpus(**_small(seed=8))
    assert np.array_equal(np.asarray(a.clouds), np.asarray(b.clouds))
    assert not np.array_equal(np.asarray(a.clouds), np.asarray(c.clouds))
