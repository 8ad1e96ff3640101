"""int8-quantized serving encoder (`fpsg_tpu/serve_quant.py`).

What must hold: (1) the BN fold + per-channel weight quantization is a
faithful rounding of the eval-path math (dequantized weights within half
an LSB of the folded f32 weights); (2) the end-to-end drift vs the f32
path is small and BOUNDED BY TEST, on both the embedding and the
generated clouds; (3) the quantized generator honors the same
batching-invariance contract as `Generator.generate_keyed`, so it is a
drop-in for the dynamic batcher.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsg_tpu.config import FPSGConfig
from fpsg_tpu.serve import Generator
from fpsg_tpu.serve_quant import QuantizedGenerator, quantize_vgg

IMG = 32
NPTS = 64


def _conf(**kw):
    return FPSGConfig(
        config_path="unused", test_path="unused",
        num_clusters=2, num_nodes=2, num_pts=NPTS,
        bottleneck_size=256, n_shot=2, **kw,
    )


@pytest.fixture(scope="module")
def gens():
    gen = Generator.from_checkpoint(_conf(seed=6), img_size=IMG)
    return gen, QuantizedGenerator(gen)


def _images(rng, q=2):
    return rng.integers(0, 256, (q, IMG, IMG, 3), dtype=np.uint8)


def _embed_f32(gen, x):
    return gen.model.apply(
        gen.variables, jnp.asarray(x, jnp.float32), False,
        method=lambda m, xq, train: m.img_encoder(xq, train))


def test_fold_and_weight_quant_are_faithful(gens):
    """Dequantized int8 weights must sit within half an LSB of the
    BN-folded f32 weights, per element (the fold itself is exact
    reassociation of the eval affine; rounding is the only error)."""
    gen, _ = gens
    enc_p = gen.variables["params"]["img_encoder"]["encoder"]
    enc_s = gen.variables["batch_stats"]["img_encoder"]["encoder"]
    layers = quantize_vgg(enc_p, enc_s)
    assert len(layers) == 13  # the 13 VGG16 convs
    # independent fold for the first conv
    k = np.asarray(enc_p["features_1"]["scale"]) / np.sqrt(
        np.asarray(enc_s["features_1"]["var"]) + 1e-5)
    w_f = np.asarray(enc_p["features_0"]["kernel"]) * k
    b_f = k * (np.asarray(enc_p["features_0"]["bias"])
               - np.asarray(enc_s["features_1"]["mean"])) \
        + np.asarray(enc_p["features_1"]["bias"])
    l0 = layers[0]
    assert np.asarray(l0["wq"]).dtype == np.int8
    np.testing.assert_allclose(np.asarray(l0["b"]), b_f, rtol=1e-6)
    deq = np.asarray(l0["wq"]).astype(np.float32) * np.asarray(l0["sw"])
    assert np.abs(deq - w_f).max() <= 0.5 * np.asarray(l0["sw"]).max()
    # every layer's weights use the full int8 range (per-channel scales)
    for lyr in layers:
        assert np.abs(np.asarray(lyr["wq"])).max() == 127


def test_embedding_drift_is_bounded(gens, rng):
    """int8 embedding vs f32 embedding: small relative L2 drift. The
    bound is empirical for this architecture (13 conv layers of
    per-tensor dynamic activation quant) and pins against regressions —
    task-level accuracy on real checkpoints is a deployment check
    (module docstring)."""
    gen, qgen = gens
    x = rng.uniform(-1, 1, (4, IMG, IMG, 3)).astype(np.float32)
    zf = np.asarray(_embed_f32(gen, x))
    zq = np.asarray(qgen.embed(x))
    rel = np.linalg.norm(zq - zf) / np.linalg.norm(zf)
    assert rel < 0.05, f"embedding drift {rel:.4f}"
    cos = (zq * zf).sum() / (np.linalg.norm(zq) * np.linalg.norm(zf))
    assert cos > 0.998, f"embedding cosine {cos:.5f}"


def test_generated_clouds_close_to_f32(gens, rng):
    """Same keys, same proto: quantized clouds must stay near the f32
    clouds — point-wise (the decode is identical and smooth in img_z)."""
    gen, qgen = gens
    clouds = rng.standard_normal((3, NPTS, 3)).astype(np.float32) * 0.3
    proto = gen.prototype(clouds)
    imgs = _images(rng, 4)
    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    cf = gen.generate_keyed(imgs, proto=proto, keys=keys)
    cq = qgen.generate_keyed(imgs, proto=proto, keys=keys)
    assert cq.shape == cf.shape and cq.dtype == np.float32
    scale = np.abs(cf).max()
    drift = np.abs(cq - cf).max() / scale
    assert drift < 0.05, f"cloud drift {drift:.4f} of scale"


def test_quant_generate_is_batching_invariant(gens, rng):
    """The drop-in contract for the dynamic batcher: permutation of a
    batch permutes the output bitwise; per-item (Q, F) protos work."""
    gen, qgen = gens
    clouds = rng.standard_normal((3, NPTS, 3)).astype(np.float32) * 0.3
    proto = np.asarray(gen.prototype(clouds))
    imgs = _images(rng, 4)
    keys = np.stack([np.array([0, s], np.uint32) for s in range(4)])
    batch = qgen.generate_keyed(imgs, proto=proto, keys=keys)
    perm = np.array([2, 0, 3, 1])
    moved = qgen.generate_keyed(imgs[perm], proto=proto, keys=keys[perm])
    np.testing.assert_array_equal(moved, batch[perm])
    tiled = qgen.generate_keyed(
        imgs, proto=np.tile(proto, (4, 1)), keys=keys)
    np.testing.assert_array_equal(tiled, batch)
    # repeat: deterministic
    np.testing.assert_array_equal(
        qgen.generate_keyed(imgs, proto=proto, keys=keys), batch)


def test_quant_in_dynamic_batcher(gens, rng):
    """QuantizedGenerator slots into BatchingEngine unchanged."""
    from fpsg_tpu.serve_http import BatchingEngine, key_data_from_seed

    _, qgen = gens
    engine = BatchingEngine(qgen, max_batch=4, max_wait_ms=200,
                            buckets=[4]).start()
    try:
        clouds = rng.standard_normal((2, NPTS, 3)).astype(np.float32) * 0.3
        engine.register_class("chair", clouds)
        fut = engine.submit(_images(rng, 1)[0], "chair",
                            key_data=key_data_from_seed(1))
        out = fut.result(timeout=300)
        assert out.shape == (NPTS, 3) and np.isfinite(out).all()
    finally:
        engine.stop()


def test_static_calibration_matches_dynamic_on_calib_batch(gens, rng):
    """Calibrating on exactly the batch being evaluated freezes the
    very scales the dynamic path would compute for it, so the static
    path must reproduce the dynamic path BITWISE on that batch."""
    gen, qgen_dyn = gens
    qgen = QuantizedGenerator(gen)      # fresh: don't mutate the fixture
    imgs = _images(rng, 4)
    clouds = rng.standard_normal((3, NPTS, 3)).astype(np.float32) * 0.3
    proto = gen.prototype(clouds)
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    dyn = qgen_dyn.generate_keyed(imgs, proto=proto, keys=keys)
    scales = qgen.calibrate(imgs)
    assert np.asarray(scales).shape == (14,)
    assert (np.asarray(scales) > 0).all()
    stat = qgen.generate_keyed(imgs, proto=proto, keys=keys)
    np.testing.assert_array_equal(stat, dyn)


def test_static_calibration_makes_coalescing_invisible(gens, rng):
    """DYNAMIC activation scales are batch-global: row i's quantization
    depends on every other row in the coalesced batch, so cross-row
    independence does NOT hold for the uncalibrated int8 path (drift
    stays within the quant tolerance, but bits differ). STATIC scales
    restore cross-row independence: at a FIXED compiled shape, row i's
    output must be bitwise identical no matter which strangers share
    the batch. (Bitwise identity across DIFFERENT batch sizes is not
    promised by any path here — per-shape XLA fusion yields ULP drift,
    see tests/test_serve.py — so the batch-1-vs-batch-4 comparison is
    an allclose, not an equality.)"""
    gen, _ = gens
    qgen = QuantizedGenerator(gen)
    calib = rng.uniform(-1, 1, (16, IMG, IMG, 3)).astype(np.float32)
    qgen.calibrate(calib)
    clouds = rng.standard_normal((3, NPTS, 3)).astype(np.float32) * 0.3
    proto = np.asarray(gen.prototype(clouds))
    imgs = _images(rng, 4)
    keys = np.stack([np.array([0, s], np.uint32) for s in range(4)])
    batch = qgen.generate_keyed(imgs, proto=np.tile(proto, (4, 1)),
                                keys=keys)
    # Same compiled shape, different strangers in rows 0/1/3: row 2
    # must not move by a single bit.
    imgs2 = imgs.copy()
    imgs2[[0, 1, 3]] = _images(rng, 3)
    keys2 = keys.copy()
    keys2[[0, 1, 3]] = np.stack(
        [np.array([7, s], np.uint32) for s in (10, 11, 12)])
    batch2 = qgen.generate_keyed(imgs2, proto=np.tile(proto, (4, 1)),
                                 keys=keys2)
    np.testing.assert_array_equal(batch2[2], batch[2])
    # Across compiled shapes (batch 1 vs 4): numerically equal only.
    alone = qgen.generate_keyed(imgs[2:3], proto=proto[None],
                                keys=keys[2:3])
    np.testing.assert_allclose(alone[0], batch[2], rtol=1e-4, atol=1e-6)


def test_static_calibration_drift_bounded_off_distribution(gens, rng):
    """Scales frozen on one sample of the input distribution must still
    serve OTHER inputs from it: embedding drift vs f32 stays within the
    dynamic path's bound (clipping only bites values above every
    calibration max)."""
    gen, _ = gens
    qgen = QuantizedGenerator(gen)
    qgen.calibrate(rng.uniform(-1, 1, (16, IMG, IMG, 3))
                   .astype(np.float32))
    x = rng.uniform(-1, 1, (4, IMG, IMG, 3)).astype(np.float32)
    zf = np.asarray(_embed_f32(gen, x))
    zq = np.asarray(qgen.embed(x))
    rel = np.linalg.norm(zq - zf) / np.linalg.norm(zf)
    assert rel < 0.06, f"static-calibrated embedding drift {rel:.4f}"


def test_int8_export_roundtrip(gens, rng, tmp_path):
    """--int8 export bakes the quantized encoder into the StableHLO
    artifact: manifest flags it, the symbolic-batch artifact serves, and
    it reproduces the LIVE QuantizedGenerator (same math, different
    lowering — near-LSB tolerance plus headroom for activation-quant
    rounding boundary flips)."""
    from fpsg_tpu.serve_export import ExportedGenerator, export_generator

    gen, qgen = gens
    out = str(tmp_path / "art_int8")
    manifest = export_generator(
        gen, out, img_size=IMG, n_support=3,
        n_points_per_cloud=NPTS, platforms=["cpu"], int8=True,
    )
    assert manifest["int8_encoder"] is True
    assert manifest["batch"] == "symbolic"
    g2 = ExportedGenerator(out)
    clouds = rng.standard_normal((3, NPTS, 3)).astype(np.float32) * 0.3
    proto = gen.prototype(clouds)
    for q in (1, 3):
        imgs = _images(rng, q)
        keys = jax.random.split(jax.random.PRNGKey(q), q)
        live = qgen.generate_keyed(imgs, proto=proto, keys=keys)
        exp = g2.generate(imgs, proto, keys=keys)
        assert exp.shape == (q, NPTS, 3)
        scale = np.abs(live).max()
        assert np.abs(exp - live).max() / scale < 0.01


def test_int8_export_requires_vgg(tmp_path):
    from fpsg_tpu.serve_export import export_generator

    gen = Generator.from_checkpoint(
        _conf(img_encoder="tiny"), img_size=IMG)
    with pytest.raises(ValueError, match="vgg_16"):
        export_generator(
            gen, str(tmp_path / "x"), img_size=IMG, n_support=2,
            n_points_per_cloud=NPTS, platforms=["cpu"], int8=True)


def test_rejects_non_vgg_backbone():
    gen = Generator.from_checkpoint(
        _conf(img_encoder="tiny"), img_size=IMG)
    with pytest.raises(ValueError, match="vgg_16"):
        QuantizedGenerator(gen)


def test_calibrate_rejects_out_of_range_integer_images(gens):
    """Integer calibration images outside uint8 range must raise, not
    silently wrap through astype(np.uint8) and corrupt the frozen
    scales (ADVICE r3)."""
    gen, _ = gens
    qgen = QuantizedGenerator(gen)
    bad = np.full((2, IMG, IMG, 3), 300, np.int32)
    with pytest.raises(ValueError, match="uint8-range"):
        qgen.calibrate(bad)
    neg = np.full((2, IMG, IMG, 3), -5, np.int64)
    with pytest.raises(ValueError, match="uint8-range"):
        qgen.calibrate(neg)
    # in-range integer pixels still calibrate
    ok = np.random.default_rng(0).integers(
        0, 256, (2, IMG, IMG, 3)).astype(np.int32)
    scales = qgen.calibrate(ok)
    assert (np.asarray(scales) > 0).all()
