"""Serving API (`fpsg_tpu/serve.py`) — the production inference surface.

The reference has no standalone inference entry point (generation is
buried in its eval/visualization code, few_shot.py:179-213); this
framework ships one, so it must be tested like any other component:
shape/dtype contract, uint8 and float input handling, determinism per
seed, checkpoint round-trip, and one-compile reuse across calls.
"""

import numpy as np
import pytest

from fpsg_tpu.config import FPSGConfig
from fpsg_tpu.serve import Generator

IMG = 32
NPTS = 64


def _conf(**kw):
    return FPSGConfig(
        config_path="unused", test_path="unused",
        num_clusters=2, num_nodes=2, num_pts=NPTS,
        bottleneck_size=256, n_shot=2, **kw,
    )


@pytest.fixture(scope="module")
def gen():
    return Generator.from_checkpoint(_conf(), img_size=IMG)


def _inputs(rng, q=2, s=3):
    imgs = rng.integers(0, 256, (q, IMG, IMG, 3), dtype=np.uint8)
    clouds = rng.standard_normal((s, NPTS, 3)).astype(np.float32) * 0.3
    return imgs, clouds


def test_generate_shape_dtype_finite(gen, rng):
    imgs, clouds = _inputs(rng)
    out = gen(imgs, clouds)
    assert out.shape == (2, NPTS, 3)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_single_image_is_batched(gen, rng):
    imgs, clouds = _inputs(rng, q=1)
    out = gen(imgs[0], clouds)          # (H, W, 3) — no batch axis
    assert out.shape == (1, NPTS, 3)


def test_uint8_matches_prescaled_float(rng):
    """uint8 input must go through the reference's [-1, 1] transform
    (generate_dataset.py normalization). uint8 ships to the device raw
    and normalizes THERE (4x less link traffic — serve.py `_norm`);
    XLA fuses the convert+scale into downstream ops, so vs the
    host-prescaled image the result is LSB-equal (~1e-8 on unit-scale
    activations), not bitwise."""
    imgs, clouds = _inputs(rng)
    g1 = Generator.from_checkpoint(_conf(), img_size=IMG)
    g2 = Generator.from_checkpoint(_conf(), img_size=IMG)
    scaled = imgs.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(g1(imgs, clouds), g2(scaled, clouds),
                               rtol=1e-5, atol=1e-6)


def test_same_seed_same_stream(rng):
    """Two generators with equal seeds produce identical call streams
    (the template RNG advances identically)."""
    imgs, clouds = _inputs(rng)
    g1 = Generator.from_checkpoint(_conf(seed=7), img_size=IMG)
    g2 = Generator.from_checkpoint(_conf(seed=7), img_size=IMG)
    np.testing.assert_array_equal(g1(imgs, clouds), g2(imgs, clouds))
    # second call advances the stream but stays in lockstep
    np.testing.assert_array_equal(g1(imgs, clouds), g2(imgs, clouds))


def test_checkpoint_roundtrip(tmp_path, rng):
    """from_checkpoint(ckpt) serves exactly the trained weights."""
    from fpsg_tpu.io.checkpoints import save_checkpoint
    from fpsg_tpu.train.loop import build_model, make_state
    from fpsg_tpu.train.optim import make_optimizer

    conf = _conf(seed=3)
    model = build_model(conf)
    state = make_state(model, conf, make_optimizer(), img_size=IMG)
    # perturb params so the checkpoint differs from a fresh init
    import jax

    state = state.replace(
        params=jax.tree.map(lambda p: p + 0.01, state.params))
    path = save_checkpoint(str(tmp_path / "ck"), state, use_orbax=False)

    served = Generator.from_checkpoint(conf, checkpoint=path,
                                       img_size=IMG)
    direct = Generator(model, {"params": state.params,
                               "batch_stats": state.batch_stats},
                       seed=conf.seed)
    imgs, clouds = _inputs(rng)
    np.testing.assert_array_equal(served(imgs, clouds),
                                  direct(imgs, clouds))

    fresh = Generator.from_checkpoint(conf, img_size=IMG)
    assert np.abs(served(imgs, clouds) - fresh(imgs, clouds)).max() > 0


def test_prototype_path_matches_full_path(rng):
    """Serving hot path: a precomputed class prototype must generate
    the same clouds as handing in the support set every call (the
    prototype is the only thing generate() derives from it)."""
    imgs, clouds = _inputs(rng)
    g1 = Generator.from_checkpoint(_conf(seed=5), img_size=IMG)
    g2 = Generator.from_checkpoint(_conf(seed=5), img_size=IMG)
    proto = g1.prototype(clouds)
    assert proto.ndim == 1
    a = g1(imgs, proto=proto)
    b = g2(imgs, clouds)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    # repeated proto calls stay in lockstep with the full path
    np.testing.assert_allclose(g1(imgs, proto=proto), g2(imgs, clouds),
                               rtol=1e-6, atol=1e-6)


def test_exactly_one_support_arg(gen, rng):
    imgs, clouds = _inputs(rng)
    with pytest.raises(ValueError):
        gen(imgs)
    with pytest.raises(ValueError):
        gen(imgs, clouds, proto=gen.prototype(clouds))


def test_stream_matches_per_call(rng):
    """stream() must yield, in order, exactly what per-call __call__
    produces with the same seed (the RNG advances once per batch in
    both paths); pipelining may not reorder or change results."""
    clouds = rng.standard_normal((3, NPTS, 3)).astype(np.float32) * 0.3
    batches = [rng.integers(0, 256, (2, IMG, IMG, 3), dtype=np.uint8)
               for _ in range(5)]
    g1 = Generator.from_checkpoint(_conf(seed=9), img_size=IMG)
    g2 = Generator.from_checkpoint(_conf(seed=9), img_size=IMG)
    proto = g1.prototype(clouds)
    streamed = list(g1.stream(iter(batches), proto=proto))
    assert len(streamed) == len(batches)
    for got, b in zip(streamed, batches):
        np.testing.assert_array_equal(got, g2(b, proto=g2.prototype(clouds)))


def test_int_images_are_pixel_bytes(rng):
    """int32/int64 pixel arrays (common out of decode/augment code)
    must normalize exactly like uint8, not slip through as floats."""
    imgs, clouds = _inputs(rng)
    g1 = Generator.from_checkpoint(_conf(seed=11), img_size=IMG)
    g2 = Generator.from_checkpoint(_conf(seed=11), img_size=IMG)
    np.testing.assert_array_equal(
        g1(imgs.astype(np.int32), clouds), g2(imgs, clouds))


def test_stream_propagates_iterator_error(rng):
    """A raising input iterator must surface the exception (previously:
    the feeder died silently and the consumer blocked forever)."""
    clouds = rng.standard_normal((2, NPTS, 3)).astype(np.float32) * 0.3
    g = Generator.from_checkpoint(_conf(), img_size=IMG)
    proto = g.prototype(clouds)

    def bad_iter():
        yield rng.integers(0, 256, (1, IMG, IMG, 3), dtype=np.uint8)
        raise RuntimeError("decode failed")

    got = []
    with pytest.raises(RuntimeError, match="decode failed"):
        for out in g.stream(bad_iter(), proto=proto):
            got.append(out)
    # consumer terminated (no deadlock) — the batch before the error
    # may be lost to the one-batch readback lag, by design.
    assert len(got) <= 1


def test_stream_early_break_does_not_deadlock(rng):
    """Breaking out of the stream must cancel the feeder thread (it
    would otherwise block forever on a full queue)."""
    clouds = rng.standard_normal((2, NPTS, 3)).astype(np.float32) * 0.3
    g = Generator.from_checkpoint(_conf(), img_size=IMG)
    proto = g.prototype(clouds)
    imgs = rng.integers(0, 256, (1, IMG, IMG, 3), dtype=np.uint8)
    s = g.stream(iter([imgs] * 50), proto=proto)
    next(s)
    s.close()   # GeneratorExit → finally → cancel.set()
    # a fresh stream on the same generator still works end-to-end
    assert len(list(g.stream(iter([imgs] * 2), proto=proto))) == 2


def test_one_executable_across_calls(gen, rng):
    """Repeated same-shape calls must not retrace/recompile (static
    shapes are the serving contract — serve.py module docstring)."""
    imgs, clouds = _inputs(rng)
    gen(imgs, clouds)
    misses0 = gen._fn._cache_size()
    for _ in range(3):
        imgs2 = np.roll(imgs, 1, axis=0)
        gen(imgs2, clouds)
    assert gen._fn._cache_size() == misses0


def test_call_retries_transient_failures(gen, rng):
    """Generation is read-only, so a transient backend failure retries in
    place (train/retry.py) — same key, bit-identical result."""
    imgs, clouds = _inputs(rng)
    want = gen(imgs, clouds)  # advances the key; next call uses a new sub

    real_fn = gen._fn
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected transient")
        return real_fn(*a, **kw)

    gen._fn = flaky
    try:
        out = gen(imgs, clouds)
    finally:
        gen._fn = real_fn
    assert calls["n"] == 2
    assert out.shape == want.shape  # a later key → values differ; shape holds

    # persistent failure exhausts the budget and re-raises
    def dead(*a, **kw):
        raise RuntimeError("persistent")

    gen._fn = dead
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="persistent"):
            gen(imgs, clouds)
    finally:
        gen._fn = real_fn


def test_generate_keyed_batching_invariant(gen, rng):
    """`generate_keyed`: row i is a pure function of (image i, proto,
    key i) — bitwise under permutation/neighbor changes at one compiled
    shape, float-tolerance across batch sizes (per-shape XLA fusion)."""
    import jax

    clouds = rng.standard_normal((3, NPTS, 3)).astype(np.float32) * 0.3
    proto = gen.prototype(clouds)
    imgs = rng.integers(0, 256, (4, IMG, IMG, 3), dtype=np.uint8)
    keys = jax.random.split(jax.random.PRNGKey(11), 4)

    batch = gen.generate_keyed(imgs, proto=proto, keys=keys)
    assert batch.shape == (4, NPTS, 3)

    perm = np.array([3, 1, 0, 2])
    moved = gen.generate_keyed(imgs[perm], proto=proto, keys=keys[perm])
    np.testing.assert_array_equal(moved, batch[perm])

    solo = gen.generate_keyed(imgs[2:3], proto=proto, keys=keys[2:3])
    np.testing.assert_allclose(solo[0], batch[2], rtol=1e-4, atol=1e-5)

    # (Q, 2) uint32 key data is accepted and equals typed keys
    kd = np.asarray(jax.random.key_data(keys)).astype(np.uint32)
    np.testing.assert_array_equal(
        gen.generate_keyed(imgs, proto=proto, keys=kd), batch)
