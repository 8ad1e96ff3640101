"""Sinkhorn EMD: sanity + convergence to exact EMD (scipy assignment)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from fpsg_tpu.ops.emd import sinkhorn_emd, emd_wrapper


def exact_emd_sq(x, y):
    """Exact OT cost for equal-size uniform clouds = assignment / N."""
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    r, c = linear_sum_assignment(d)
    return d[r, c].mean()


def test_identity_is_zero(rng):
    x = jnp.array(rng.standard_normal((2, 64, 3), np.float32))
    out = sinkhorn_emd(x, x, eps=0.01, n_iters=100)
    np.testing.assert_allclose(out, 0.0, atol=1e-2)


def test_converges_to_exact(rng):
    x = rng.standard_normal((1, 48, 3), np.float32)
    y = rng.standard_normal((1, 48, 3), np.float32)
    approx = float(sinkhorn_emd(jnp.array(x), jnp.array(y),
                                eps=0.01, n_iters=2000)[0])
    exact = exact_emd_sq(x[0], y[0])
    assert abs(approx - exact) / exact < 0.02, (approx, exact)


def test_symmetry(rng):
    x = jnp.array(rng.standard_normal((1, 64, 3), np.float32))
    y = jnp.array(rng.standard_normal((1, 64, 3), np.float32))
    # Alternating updates break exact symmetry at finite iteration count;
    # near convergence the residual asymmetry is small.
    a = sinkhorn_emd(x, y, n_iters=1000)
    b = sinkhorn_emd(y, x, n_iters=1000)
    np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)


def test_reduce_and_wrapper(rng):
    x = jnp.array(rng.standard_normal((3, 32, 3), np.float32))
    y = jnp.array(rng.standard_normal((3, 32, 3), np.float32))
    per = sinkhorn_emd(x, y)
    np.testing.assert_allclose(
        sinkhorn_emd(x, y, reduce="sum"), per.sum(), rtol=1e-6)
    np.testing.assert_allclose(emd_wrapper(x, y), per.sum(), rtol=1e-6)


def test_grad_is_finite_and_descends(rng):
    """Envelope gradient should move x toward y."""
    x = jnp.array(rng.standard_normal((1, 32, 3), np.float32))
    y = jnp.array(rng.standard_normal((1, 32, 3), np.float32)) + 2.0

    loss = lambda x: sinkhorn_emd(x, y, n_iters=100, reduce="sum")
    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    l0, l1 = float(loss(x)), float(loss(x - 0.1 * g))
    assert l1 < l0


def test_euclidean_cost_and_mean_reduce(rng):
    x = jnp.array(rng.standard_normal((2, 32, 3), np.float32))
    y = jnp.array(rng.standard_normal((2, 32, 3), np.float32))
    per = sinkhorn_emd(x, y, n_iters=50, cost="euclidean")
    assert per.shape == (2,)
    assert (np.asarray(per) > 0).all()
    m = sinkhorn_emd(x, y, n_iters=50, cost="euclidean", reduce="mean")
    np.testing.assert_allclose(float(m), float(per.mean()), rtol=1e-6)
    # euclidean ground cost gives smaller values than squared for d>1
    sq = sinkhorn_emd(x, y, n_iters=50, cost="sqeuclidean")
    assert np.isfinite(np.asarray(sq)).all()


def test_pallas_matches_oracle_potentials(rng):
    x = jnp.array(rng.standard_normal((2, 64, 3), np.float32))
    y = jnp.array(rng.standard_normal((2, 64, 3), np.float32))
    a = sinkhorn_emd(x, y, n_iters=80, impl="oracle")
    b = sinkhorn_emd(x, y, n_iters=80, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-5)


def test_overrelaxation_preserves_fixed_point(rng):
    """omega only changes the iteration path, not the entropic fixed
    point: plain and over-relaxed runs converge to the same value (both
    impls). Run well past convergence at a moderate eps so the fixed
    point itself is the comparison, not the transient."""
    x = jnp.array(rng.standard_normal((2, 48, 3), np.float32)) * 0.4
    y = jnp.array(rng.standard_normal((2, 48, 3), np.float32)) * 0.4
    kw = dict(eps=2e-3, n_iters=600, tol=0.0)
    ref = sinkhorn_emd(x, y, impl="oracle", omega=1.0, **kw)
    for impl in ("oracle", "pallas"):
        rel = sinkhorn_emd(x, y, impl=impl, omega=1.6, **kw)
        np.testing.assert_allclose(np.asarray(rel), np.asarray(ref),
                                   rtol=5e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# Convention pinning (VERDICT r1 item 4): the call's exact semantics,
# asserted against an INDEPENDENT numpy implementation. This makes "EMD
# within 1%" falsifiable: the convention is
#   cost C_ij = ||x_i - y_j||^2, uniform marginals 1/N and 1/M,
#   value = <P*, C> at the Sinkhorn fixed point (no entropy term),
#   reduce='sum' = sum over the batch (reference src/models/utils.py:12-13);
# and the round-3 DEFAULT eps/n_iters put that value within 1% of TRUE EMD
# at production shapes (benchmarks/emd_exact_bound.py; N=2048 table in
# BASELINE.md; pinned here at a CI-sized N).
# ---------------------------------------------------------------------------

def _emd_sinkhorn_numpy(x, y, eps=0.01, n_iters=3000):
    """Independent log-domain Sinkhorn (numpy, fixed eps, run to the fixed
    point). Returns <P, C> with C = squared euclidean, uniform marginals."""
    from scipy.special import logsumexp

    n, m = len(x), len(y)
    c = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1).astype(np.float64)
    log_mu, log_nu = -np.log(n), -np.log(m)
    f = np.zeros(n)
    g = np.zeros(m)
    for _ in range(n_iters):
        f = -eps * logsumexp((g[None, :] - c) / eps + log_nu, axis=1)
        g = -eps * logsumexp((f[:, None] - c) / eps + log_mu, axis=0)
    p = np.exp((f[:, None] + g[None, :] - c) / eps + log_mu + log_nu)
    return float((p * c).sum())


def test_fixed_point_matches_numpy_oracle(rng):
    """sinkhorn_emd at an explicit eps (annealed) == independent fixed-eps
    numpy Sinkhorn at the same fixed point, both cloud-size regimes."""
    for n, m in [(32, 32), (48, 32)]:
        x = rng.standard_normal((n, 3)).astype(np.float32) * 0.4
        y = rng.standard_normal((m, 3)).astype(np.float32) * 0.4
        ours = float(
            sinkhorn_emd(jnp.array(x)[None], jnp.array(y)[None],
                         eps=0.01, n_iters=400)[0]
        )
        ref = _emd_sinkhorn_numpy(x, y, eps=0.01)
        np.testing.assert_allclose(ours, ref, rtol=2e-3,
                                   err_msg=f"(n={n}, m={m})")


def test_production_default_within_1pct_of_exact(rng):
    """The DEFAULT call (the evaluator's metric) lands within 1% of TRUE
    EMD (exact assignment) — the tuned accuracy regime, pinned at a
    CI-sized N (the N=2048 production measurement is in BASELINE.md:
    0.21% mean, <1% max over 20 random + reconstruction-like pairs)."""
    for scale in (1.0, 0.15):   # far-apart and reconstruction-like pairs
        x = rng.standard_normal((256, 3)).astype(np.float32) * 0.4
        y = x * (1 - scale) + scale * rng.standard_normal(
            (256, 3)).astype(np.float32) * 0.4
        ours = float(sinkhorn_emd(
            jnp.array(x)[None], jnp.array(y)[None], impl="oracle")[0])
        exact = exact_emd_sq(x, y)
        assert abs(ours - exact) / exact < 0.01, (scale, ours, exact)


def test_multiscale_matches_cold_fixed_point(rng):
    """The coarse-to-fine warm start (coarse=) reaches the same entropic
    fixed point as the cold annealed solve — the warm start changes the
    iteration path, not the problem. Reconstruction-like pairs (the hard
    small-cost regime) at a production-like eps-to-cost ratio."""
    x = rng.standard_normal((2, 512, 3)).astype(np.float32) * 0.3
    y = (x + rng.standard_normal((2, 512, 3)).astype(np.float32) * 0.05)
    cold = np.asarray(sinkhorn_emd(jnp.array(x), jnp.array(y),
                                   eps=1e-3, n_iters=300))
    warm = np.asarray(sinkhorn_emd(jnp.array(x), jnp.array(y),
                                   eps=1e-3, n_iters=300,
                                   coarse=128, coarse_iters=300))
    np.testing.assert_allclose(warm, cold, rtol=5e-3)


def test_multiscale_ignored_when_cloud_too_small(rng):
    """coarse >= N/4 falls back to the cold path (identical result)."""
    x = jnp.array(rng.standard_normal((1, 64, 3)).astype(np.float32) * 0.4)
    y = jnp.array(rng.standard_normal((1, 64, 3)).astype(np.float32) * 0.4)
    a = sinkhorn_emd(x, y, eps=1e-3, n_iters=200)
    b = sinkhorn_emd(x, y, eps=1e-3, n_iters=200, coarse=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_emd_wrapper_is_sum_reduced_default(rng):
    """emd_wrapper == sinkhorn_emd(reduce='sum') at default settings — the
    drop-in for emd_loss(..., reduce='sum', sinkhorn=True)."""
    x = jnp.array(rng.standard_normal((3, 32, 3)).astype(np.float32) * 0.4)
    y = jnp.array(rng.standard_normal((3, 32, 3)).astype(np.float32) * 0.4)
    w = float(emd_wrapper(x, y))
    per = sinkhorn_emd(x, y)
    np.testing.assert_allclose(w, float(jnp.sum(per)), rtol=1e-6)
