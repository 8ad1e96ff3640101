"""Serialized serving artifacts (`fpsg_tpu/serve_export.py`).

The exported StableHLO must reproduce the live Generator (weights baked
in), accept any batch size from one artifact (symbolic batch dim), and
load/run WITHOUT model code — the deserialized side only touches
jax.export. The reference has no deployment packaging at all; this is a
new capability, tested like a contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpsg_tpu.config import FPSGConfig
from fpsg_tpu.serve import Generator
from fpsg_tpu.serve_export import ExportedGenerator, export_generator

IMG = 32
NPTS = 64
NSUP = 3


def _conf():
    return FPSGConfig(
        config_path="unused", test_path="unused",
        num_clusters=2, num_nodes=2, num_pts=NPTS,
        bottleneck_size=256, n_shot=2,
    )


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    gen = Generator.from_checkpoint(_conf(), img_size=IMG)
    out = str(tmp_path_factory.mktemp("art"))
    manifest = export_generator(
        gen, out, img_size=IMG, n_support=NSUP,
        n_points_per_cloud=NPTS, platforms=["cpu"],
    )
    return gen, out, manifest


def _inputs(rng, q=2):
    imgs = rng.integers(0, 256, (q, IMG, IMG, 3), dtype=np.uint8)
    clouds = rng.standard_normal((NSUP, NPTS, 3)).astype(np.float32) * 0.3
    return imgs, clouds


def test_roundtrip_matches_live_generator(artifacts, rng):
    gen, out, _ = artifacts
    g2 = ExportedGenerator(out)
    imgs, clouds = _inputs(rng)

    proto_live = gen.prototype(clouds)
    proto_exp = g2.prototype(clouds)
    np.testing.assert_allclose(
        np.asarray(proto_live), np.asarray(proto_exp), rtol=1e-5, atol=1e-6)

    key = jax.random.PRNGKey(7)
    item_keys = jax.random.split(key, imgs.shape[0])
    live = gen.generate_keyed(imgs, proto=proto_live, keys=item_keys)
    exp = g2.generate(imgs, proto_exp, key=key)  # splits per item inside
    # same math, different lowering path → LSB-level fusion differences
    np.testing.assert_allclose(live, exp, rtol=1e-4, atol=1e-5)


def test_symbolic_batch_one_artifact_every_size(artifacts, rng):
    _, out, manifest = artifacts
    assert manifest["batch"] == "symbolic"
    g2 = ExportedGenerator(out)
    _, clouds = _inputs(rng)
    proto = g2.prototype(clouds)
    for q in (1, 3, 5):
        imgs = rng.integers(0, 256, (q, IMG, IMG, 3), dtype=np.uint8)
        assert g2.generate(imgs, proto, seed=q).shape == (q, NPTS, 3)
    # single unbatched image gets the batch axis added
    img = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
    assert g2.generate(img, proto, seed=0).shape == (1, NPTS, 3)


def test_deterministic_per_key_and_seed(artifacts, rng):
    _, out, _ = artifacts
    g2 = ExportedGenerator(out)
    imgs, clouds = _inputs(rng, q=1)
    proto = g2.prototype(clouds)
    a = g2.generate(imgs, proto, seed=11)
    b = g2.generate(imgs, proto, seed=11)
    c = g2.generate(imgs, proto, seed=12)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # template rng actually feeds through


def test_fixed_batch_export_fallback(tmp_path, rng):
    gen = Generator.from_checkpoint(_conf(), img_size=IMG)
    out = str(tmp_path / "fixed")
    manifest = export_generator(
        gen, out, img_size=IMG, n_support=NSUP,
        n_points_per_cloud=NPTS, platforms=["cpu"], batch=2,
    )
    assert manifest["batch"] == 2
    g2 = ExportedGenerator(out)
    imgs, clouds = _inputs(rng, q=2)
    out_arr = g2.generate(imgs, g2.prototype(clouds), seed=1)
    assert out_arr.shape == (2, NPTS, 3)


def test_one_executable_across_calls(artifacts, rng):
    """jitted Exported.call: repeated same-shape serving calls reuse one
    compiled executable (Exported.call alone re-traces every call)."""
    _, out, _ = artifacts
    g2 = ExportedGenerator(out)
    imgs, clouds = _inputs(rng, q=2)
    proto = g2.prototype(clouds)
    g2.generate(imgs, proto, seed=0)
    misses0 = g2._gen_call._cache_size()
    for s in range(3):
        g2.generate(imgs, proto, seed=s)
    assert g2._gen_call._cache_size() == misses0


def test_per_item_keys_coalescing_invariant(artifacts, rng):
    """The artifact is keyed PER ITEM: what a request gets cannot depend
    on which other requests it was coalesced with. At one compiled shape
    the guarantee is BITWISE (permuting rows / replacing neighbors moves
    or changes nothing else); across batch sizes it holds to float
    tolerance (per-size XLA fusion differs in the LSBs)."""
    _, out, _ = artifacts
    g2 = ExportedGenerator(out)
    imgs, clouds = _inputs(rng, q=4)
    proto = g2.prototype(clouds)
    keys = np.asarray(jax.random.key_data(
        jax.random.split(jax.random.PRNGKey(3), 4))).astype(np.uint32)

    batch = g2.generate(imgs, proto, keys=keys)

    # bitwise: permutation at the same compiled shape
    perm = np.array([2, 0, 3, 1])
    moved = g2.generate(imgs[perm], proto, keys=keys[perm])
    np.testing.assert_array_equal(moved, batch[perm])

    # bitwise: neighbor content at the same compiled shape
    imgs2 = imgs.copy()
    imgs2[3] = rng.integers(0, 256, (IMG, IMG, 3), dtype=np.uint8)
    keys2 = keys.copy()
    keys2[3] ^= 0xFFFF
    other = g2.generate(imgs2, proto, keys=keys2)
    np.testing.assert_array_equal(other[:3], batch[:3])

    # cross batch size: same request alone == same row, float-level
    solo = g2.generate(imgs[1:2], proto, keys=keys[1:2])
    np.testing.assert_allclose(solo[0], batch[1], rtol=1e-4, atol=1e-5)
