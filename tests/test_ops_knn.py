"""kNN indices vs brute-force numpy; reference semantics (self included)."""

import jax.numpy as jnp
import numpy as np

from fpsg_tpu.ops.knn import knn_indices


def knn_numpy(x, k):
    out = np.empty(x.shape[:2] + (k,), np.int64)
    for b in range(x.shape[0]):
        d = ((x[b][:, None, :] - x[b][None, :, :]) ** 2).sum(-1)
        out[b] = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return out


def test_matches_bruteforce(rng):
    x = rng.standard_normal((2, 100, 3), np.float32)
    got = np.asarray(knn_indices(jnp.array(x), k=8))
    want = knn_numpy(x, 8)
    # Sets must agree (tie order can differ between top_k and argsort).
    for b in range(2):
        for i in range(100):
            assert set(got[b, i]) == set(want[b, i])


def test_self_is_included(rng):
    x = rng.standard_normal((1, 64, 16), np.float32)
    idx = np.asarray(knn_indices(jnp.array(x), k=5))
    assert (idx[0, :, 0] == np.arange(64)).all()


def test_pallas_matches_oracle(rng):
    x = rng.standard_normal((2, 256, 3), np.float32)
    a = np.asarray(knn_indices(jnp.array(x), k=8, impl="oracle"))
    b = np.asarray(knn_indices(jnp.array(x), k=8, impl="pallas"))
    for bi in range(2):
        for i in range(256):
            assert set(a[bi, i]) == set(b[bi, i]), (bi, i)


def test_pallas_wide_features(rng):
    x = rng.standard_normal((1, 128, 64), np.float32)
    a = np.asarray(knn_indices(jnp.array(x), k=4, impl="oracle"))
    b = np.asarray(knn_indices(jnp.array(x), k=4, impl="pallas"))
    np.testing.assert_array_equal(np.sort(a, -1), np.sort(b, -1))
