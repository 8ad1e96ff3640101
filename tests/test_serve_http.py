"""Dynamic-batching HTTP serving (`fpsg_tpu/serve_http.py`).

The load-bearing claim is that coalescing is SEMANTICALLY INVISIBLE:
a request's bits do not depend on which batch it shipped in, on padding
rows, or on which other classes shared the dispatch. That invariance is
what `per_item_template_points` + the (B, F) per-item proto batch in
`generate_from_proto` (models/protonet.py) were built to provide; here
it is asserted end-to-end through the batcher and the HTTP layer.
"""

import json
import io
import threading
import urllib.request

import jax
import numpy as np
import pytest

from fpsg_tpu.config import FPSGConfig
from fpsg_tpu.serve import Generator
from fpsg_tpu.serve_http import (
    BatchingEngine, key_data_from_seed, make_server)

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
    # one module-scope generator: every engine in this file shares its
    # jit cache, so each (bucket, proto-rank) shape compiles once
    return Generator.from_checkpoint(_conf(seed=4), img_size=IMG)


def _images(rng, q=1):
    return rng.integers(0, 256, (q, IMG, IMG, 3), dtype=np.uint8)


def _clouds(rng, s=3):
    return rng.standard_normal((s, NPTS, 3)).astype(np.float32) * 0.3


def _keys(*seeds):
    return np.stack([key_data_from_seed(s) for s in seeds])


def test_key_data_matches_prngkey():
    """Host-side key construction must equal jax.random.PRNGKey for
    32-bit seeds — the no-device-dispatch-per-request property relies
    on it. (Above 2^32, PRNGKey without x64 TRUNCATES the seed;
    key_data_from_seed keeps the high word — strictly more entropy.)"""
    for seed in (0, 7, 123456789, 2**31, 2**32 - 1):
        want = np.asarray(jax.random.key_data(jax.random.PRNGKey(seed)))
        np.testing.assert_array_equal(
            key_data_from_seed(seed), want.astype(np.uint32))
    hi = key_data_from_seed(2**63 - 1)
    np.testing.assert_array_equal(
        hi, np.array([2**31 - 1, 2**32 - 1], np.uint32))


def test_proto_batch_matches_shared(gen, rng):
    """(Q, F) per-item proto with identical rows == shared (F,) proto,
    bitwise (generate_from_proto's two proto ranks are the same math)."""
    proto = gen.prototype(_clouds(rng))
    imgs = _images(rng, 4)
    keys = _keys(1, 2, 3, 4)
    shared = gen.generate_keyed(imgs, proto=proto, keys=keys)
    tiled = gen.generate_keyed(
        imgs, proto=np.tile(np.asarray(proto), (4, 1)), keys=keys)
    np.testing.assert_array_equal(shared, tiled)


def test_engine_coalesces_and_is_invisible(gen, rng):
    """Three concurrent submits coalesce into ONE padded dispatch whose
    per-request results are bitwise identical to the same requests in a
    full batch of the same bucket (padding rows are invisible)."""
    engine = BatchingEngine(gen, max_batch=4, max_wait_ms=500,
                            buckets=[4]).start()
    try:
        engine.register_class("chair", _clouds(rng))
        proto = engine._protos["chair"]
        imgs = _images(rng, 4)
        keys = _keys(10, 11, 12, 13)

        futs = [engine.submit(imgs[i], "chair", key_data=keys[i])
                for i in range(3)]
        got3 = np.stack([f.result(timeout=120) for f in futs])

        s = engine.stats()
        assert s["requests"] == 3
        assert s["batches"] == 1          # coalesced, not 3 dispatches
        assert s["padded_rows"] == 1      # 3 -> bucket 4
        assert s["batch_size_hist"] == {4: 1}

        # same three requests inside a FULL batch of the same bucket
        futs = [engine.submit(imgs[i], "chair", key_data=keys[i])
                for i in range(4)]
        got4 = np.stack([f.result(timeout=120) for f in futs])
        np.testing.assert_array_equal(got3, got4[:3])

        # and against the direct device path with per-item protos
        direct = gen.generate_keyed(
            imgs, proto=np.tile(proto, (4, 1)), keys=keys)
        np.testing.assert_array_equal(got4, direct)
    finally:
        engine.stop()


def test_engine_mixes_classes_in_one_batch(gen, rng):
    """Requests for different classes coalesce into one dispatch, each
    row seeing only its own class prototype."""
    engine = BatchingEngine(gen, max_batch=4, max_wait_ms=500,
                            buckets=[4]).start()
    try:
        engine.register_class("chair", _clouds(rng))
        engine.register_class("lamp", _clouds(rng))
        pa, pb = engine._protos["chair"], engine._protos["lamp"]
        assert np.abs(pa - pb).max() > 0
        imgs = _images(rng, 2)
        keys = _keys(20, 21)

        fa = engine.submit(imgs[0], "chair", key_data=keys[0])
        fb = engine.submit(imgs[1], "lamp", key_data=keys[1])
        got = np.stack([fa.result(timeout=120), fb.result(timeout=120)])
        assert engine.stats()["batches"] == 1

        direct = gen.generate_keyed(
            np.concatenate([imgs, imgs]),
            proto=np.stack([pa, pb, pa, pb]),
            keys=np.concatenate([keys, keys]))
        np.testing.assert_array_equal(got, direct[:2])
    finally:
        engine.stop()


def test_engine_rejects_bad_input(gen, rng):
    engine = BatchingEngine(gen, max_batch=4, buckets=[4]).start()
    try:
        with pytest.raises(KeyError, match="unknown class"):
            engine.submit(_images(rng)[0], "nope")
        engine.register_class("chair", _clouds(rng))
        with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
            engine.submit(_images(rng, 2), "chair")  # batched input
        with pytest.raises(ValueError, match="key_data"):
            engine.submit(_images(rng)[0], "chair",
                          key_data=np.zeros(3, np.uint32))
        with pytest.raises(ValueError, match="prototype must be"):
            engine.register_prototype("bad", np.zeros((2, 8)))
    finally:
        engine.stop()
    with pytest.raises(RuntimeError, match="not started"):
        engine.submit(_images(rng)[0], "chair")


def test_engine_absorbs_transient_and_routes_persistent_errors(gen, rng):
    """The dispatch is read-only, so a SINGLE transient device failure
    is retried in place and the caller never sees it (CLAUDE.md: the
    axon tunnel throws INVALID_ARGUMENT bursts); a PERSISTENT failure
    exhausts the retry budget and fails the batch's futures — not the
    batcher thread (the server keeps serving)."""
    engine = BatchingEngine(gen, max_batch=4, max_wait_ms=200,
                            buckets=[4]).start()
    try:
        engine.register_class("chair", _clouds(rng))
        real = engine.gen.generate_keyed
        calls = {"n": 0, "mode": "flaky_once"}

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["mode"] == "dead" or calls["n"] == 1:
                raise RuntimeError("injected device failure")
            return real(*a, **kw)

        engine.gen = type("G", (), {
            "generate_keyed": staticmethod(flaky),
            "prototype": staticmethod(engine.gen.prototype)})()
        # one flake: absorbed by the in-place retry, caller unaffected
        fut = engine.submit(_images(rng)[0], "chair",
                            key_data=key_data_from_seed(1))
        assert fut.result(timeout=120).shape == (NPTS, 3)
        assert calls["n"] == 2  # the retry actually happened

        # persistent failure: exhausts the budget, routed to callers
        calls["mode"] = "dead"
        fut = engine.submit(_images(rng)[0], "chair",
                            key_data=key_data_from_seed(2))
        with pytest.raises(RuntimeError, match="injected"):
            fut.result(timeout=120)

        # engine still alive: the next request succeeds
        calls["mode"] = "ok"
        fut = engine.submit(_images(rng)[0], "chair",
                            key_data=key_data_from_seed(3))
        assert fut.result(timeout=120).shape == (NPTS, 3)
    finally:
        engine.stop()


# -- HTTP end-to-end -------------------------------------------------------


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers=headers or {})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def _npy(arr):
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


@pytest.fixture()
def server(gen):
    engine = BatchingEngine(gen, max_batch=4, max_wait_ms=20,
                            buckets=[4], seed=9).start()
    srv = make_server(engine, "127.0.0.1", 0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    try:
        yield base, engine
    finally:
        srv.shutdown()
        engine.stop()


def test_http_end_to_end(server, rng, gen):
    base, engine = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        assert r.read() == b"ok"

    clouds = _clouds(rng)
    status, body = _post(base + "/v1/classes/chair", _npy(clouds))
    assert status == 200
    dim = json.loads(body)["dim"]
    assert dim == np.asarray(engine._protos["chair"]).shape[0]

    with urllib.request.urlopen(base + "/v1/classes", timeout=30) as r:
        assert json.loads(r.read())["classes"] == ["chair"]

    # single seeded image: repeatable bits, equal to the direct path
    img = _images(rng)[0]
    status, b1 = _post(base + "/v1/generate?class=chair&seed=42",
                       _npy(img))
    assert status == 200
    out1 = np.load(io.BytesIO(b1), allow_pickle=False)
    assert out1.shape == (NPTS, 3) and out1.dtype == np.float32
    _, b2 = _post(base + "/v1/generate?class=chair&seed=42", _npy(img))
    np.testing.assert_array_equal(
        out1, np.load(io.BytesIO(b2), allow_pickle=False))

    direct = gen.generate_keyed(
        img[None], proto=engine._protos["chair"], keys=_keys(42))
    # same key, same image; batch shape may differ (1 vs bucket 4)
    np.testing.assert_allclose(out1, direct[0], rtol=1e-4, atol=1e-5)

    # multi-image request: row i uses seed + i
    imgs = _images(rng, 2)
    _, b3 = _post(base + "/v1/generate?class=chair&seed=100", _npy(imgs))
    out3 = np.load(io.BytesIO(b3), allow_pickle=False)
    assert out3.shape == (2, NPTS, 3)
    _, b4 = _post(base + "/v1/generate?class=chair&seed=101",
                  _npy(imgs[1]))
    np.testing.assert_array_equal(
        out3[1], np.load(io.BytesIO(b4), allow_pickle=False))

    s = json.loads(urllib.request.urlopen(
        base + "/v1/stats", timeout=30).read())
    assert s["requests"] >= 5 and s["batches"] >= 1
    assert s["latency_ms"]["p50"] is not None


def test_http_prototype_upload_and_errors(server, rng, gen):
    base, engine = server
    proto = np.asarray(gen.prototype(_clouds(rng)), np.float32)
    status, body = _post(base + "/v1/classes/lamp", _npy(proto),
                         headers={"X-FPSG-Kind": "prototype"})
    assert status == 200 and json.loads(body)["dim"] == proto.shape[0]
    np.testing.assert_array_equal(engine._protos["lamp"], proto)

    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/generate?class=missing",
              _npy(_images(rng)[0]))
    assert ei.value.code == 400
    assert "unknown class" in json.loads(ei.value.read())["error"]

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/generate", _npy(_images(rng)[0]))
    assert ei.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v1/classes/bad", _npy(np.zeros((4, 4))))
    assert ei.value.code == 400

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/nope", b"")
    assert ei.value.code == 404
