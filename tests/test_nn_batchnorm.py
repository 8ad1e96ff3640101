"""Golden parity: fpsg_tpu BatchNorm vs torch.nn.BatchNorm1d semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from fpsg_tpu.nn.normalization import BatchNorm


def _make(feature_axes=(-1,), group_axes=()):
    return BatchNorm(feature_axes=feature_axes, group_axes=group_axes)


def test_train_output_and_running_stats_match_torch(rng):
    b, n, ch = 6, 50, 16
    x = rng.standard_normal((b, n, ch)).astype(np.float32)

    bn = _make()
    variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), False)
    # seed non-trivial params/stats
    scale = rng.standard_normal(ch).astype(np.float32)
    bias_ = rng.standard_normal(ch).astype(np.float32)
    rmean = rng.standard_normal(ch).astype(np.float32)
    rvar = rng.uniform(0.5, 2.0, ch).astype(np.float32)
    variables = {
        "params": {"scale": jnp.array(scale), "bias": jnp.array(bias_)},
        "batch_stats": {"mean": jnp.array(rmean), "var": jnp.array(rvar)},
    }
    y, updated = bn.apply(
        variables, jnp.array(x), False, mutable=["batch_stats"]
    )

    tbn = torch.nn.BatchNorm1d(ch)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias_))
        tbn.running_mean.copy_(torch.from_numpy(rmean))
        tbn.running_var.copy_(torch.from_numpy(rvar))
    tbn.train()
    # torch layout (B, C, N)
    ty = tbn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)

    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)


def test_eval_matches_torch(rng):
    b, n, ch = 4, 30, 8
    x = rng.standard_normal((b, n, ch)).astype(np.float32)
    scale = rng.standard_normal(ch).astype(np.float32)
    bias_ = rng.standard_normal(ch).astype(np.float32)
    rmean = rng.standard_normal(ch).astype(np.float32)
    rvar = rng.uniform(0.5, 2.0, ch).astype(np.float32)

    bn = _make()
    variables = {
        "params": {"scale": jnp.array(scale), "bias": jnp.array(bias_)},
        "batch_stats": {"mean": jnp.array(rmean), "var": jnp.array(rvar)},
    }
    y = bn.apply(variables, jnp.array(x), True)

    tbn = torch.nn.BatchNorm1d(ch)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias_))
        tbn.running_mean.copy_(torch.from_numpy(rmean))
        tbn.running_var.copy_(torch.from_numpy(rvar))
    tbn.eval()
    ty = tbn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y), ty.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_grouped_sequential_running_update_matches_torch_loop(rng):
    """Shared BN applied once per node (reference deformer pattern):
    grouped train-mode stats + sequentially-folded running update."""
    b, g, p, ch = 3, 4, 32, 8
    x = rng.standard_normal((b, g, p, ch)).astype(np.float32)

    bn = BatchNorm(feature_axes=(-1,), group_axes=(1,))
    scale = rng.standard_normal(ch).astype(np.float32)
    bias_ = rng.standard_normal(ch).astype(np.float32)
    variables = {
        "params": {"scale": jnp.array(scale), "bias": jnp.array(bias_)},
        "batch_stats": {"mean": jnp.zeros(ch), "var": jnp.ones(ch)},
    }
    y, updated = bn.apply(
        variables, jnp.array(x), False, mutable=["batch_stats"]
    )

    tbn = torch.nn.BatchNorm1d(ch)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias_))
    tbn.train()
    outs = []
    for i in range(g):
        xi = torch.from_numpy(x[:, i]).permute(0, 2, 1)   # (B, C, P)
        outs.append(tbn(xi).permute(0, 2, 1).detach().numpy())
    want = np.stack(outs, axis=1)

    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]),
        tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["var"]),
        tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)


def test_multiaxis_features(rng):
    """Per-(cluster, node, channel) stacked BNs == 16 separate torch BNs."""
    b, c, nn_, p, ch = 2, 2, 3, 16, 4
    x = rng.standard_normal((b, c, nn_, p, ch)).astype(np.float32)
    bn = BatchNorm(feature_axes=(1, 2, -1))
    variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), False)
    assert variables["params"]["scale"].shape == (c, nn_, ch)
    y, updated = bn.apply(
        variables, jnp.array(x), False, mutable=["batch_stats"]
    )

    for ci in range(c):
        for ni in range(nn_):
            tbn = torch.nn.BatchNorm1d(ch)
            tbn.train()
            xi = torch.from_numpy(x[:, ci, ni]).permute(0, 2, 1)
            ty = tbn(xi).permute(0, 2, 1).detach().numpy()
            np.testing.assert_allclose(
                np.asarray(y)[:, ci, ni], ty, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(updated["batch_stats"]["mean"])[ci, ni],
                tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)


def test_cross_replica_stats_match_global_batch(rng):
    """BN with axis_name inside shard_map == BN over the concatenated
    batch (SURVEY.md §2.6: sharded episodes reproduce single-device
    statistics)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from fpsg_tpu.parallel import make_mesh

    mesh = make_mesh(dp=8, mp=1)
    b_per, n, ch = 2, 10, 4
    x = rng.standard_normal((8 * b_per, n, ch)).astype(np.float32)

    bn_sync = BatchNorm(axis_name="dp")
    # init in eval mode: pmean is only valid inside the mapped context
    variables = bn_sync.init(jax.random.PRNGKey(0), jnp.array(x[:2]), True)

    def shard_fn(xs):
        y, mut = bn_sync.apply(
            variables, xs, False, mutable=["batch_stats"]
        )
        return y, mut["batch_stats"]

    y_sh, stats_sh = jax.jit(
        jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=P("dp"), out_specs=(P("dp"), P()),
            check_vma=False,
        )
    )(jnp.array(x))

    bn_plain = BatchNorm()
    y_pl, mut_pl = bn_plain.apply(
        variables, jnp.array(x), False, mutable=["batch_stats"]
    )

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_pl),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats_sh["mean"]),
        np.asarray(mut_pl["batch_stats"]["mean"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stats_sh["var"]),
        np.asarray(mut_pl["batch_stats"]["var"]), rtol=1e-4, atol=1e-6)


def test_zero_variance_channel_stable(rng):
    """Constant-input channels (the conditioning pathology, DESIGN.md §8)
    must stay finite in both train and eval modes."""
    x = np.ones((4, 16, 8), np.float32) * 3.0   # zero variance everywhere
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.array(x), False)
    y, mut = bn.apply(variables, jnp.array(x), False,
                      mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-4)
    y_eval = bn.apply(
        {"params": variables["params"],
         "batch_stats": mut["batch_stats"]},
        jnp.array(x), True,
    )
    assert np.isfinite(np.asarray(y_eval)).all()


def test_shift_fold_matches_explicit_bias_add(rng):
    """BN(x, shift=b) must behave exactly as BN(x + expand(b)): train-mode
    output, running-stat updates, and eval-mode output (the conv-bias fold
    identity the round-2 layers rely on)."""
    x = rng.standard_normal((6, 20, 10)).astype(np.float32)
    b = rng.standard_normal((10,)).astype(np.float32)

    for two_pass in (True, False):
        bn = BatchNorm(two_pass=two_pass)
        v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

        y_fold, mut_fold = bn.apply(
            v, jnp.asarray(x), False, shift=jnp.asarray(b),
            mutable=["batch_stats"])
        y_add, mut_add = bn.apply(
            v, jnp.asarray(x + b[None, None, :]), False,
            mutable=["batch_stats"])

        np.testing.assert_allclose(
            np.asarray(y_fold), np.asarray(y_add), rtol=1e-5, atol=1e-6)
        for kstat in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_fold["batch_stats"][kstat]),
                np.asarray(mut_add["batch_stats"][kstat]),
                rtol=1e-5, atol=1e-6)

        # eval mode with the updated (bias-inclusive) running stats
        ev_fold = bn.apply(
            {"params": v["params"],
             "batch_stats": mut_fold["batch_stats"]},
            jnp.asarray(x), True, shift=jnp.asarray(b))
        ev_add = bn.apply(
            {"params": v["params"], "batch_stats": mut_add["batch_stats"]},
            jnp.asarray(x + b[None, None, :]), True)
        np.testing.assert_allclose(
            np.asarray(ev_fold), np.asarray(ev_add), rtol=1e-5, atol=1e-6)


def test_grouped_shift_fold(rng):
    """Fold identity with group axes + the fused relu activation (the
    decoder's deformer BN configuration)."""
    x = rng.standard_normal((4, 3, 5, 16, 8)).astype(np.float32)
    b = rng.standard_normal((3, 8)).astype(np.float32)
    bn = BatchNorm(feature_axes=(1, -1), group_axes=(2,), two_pass=False,
                   activation="relu")
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    y_fold, mut_fold = bn.apply(
        v, jnp.asarray(x), False, shift=jnp.asarray(b),
        mutable=["batch_stats"])
    xb = x + b[None, :, None, None, :]
    y_add, mut_add = bn.apply(
        v, jnp.asarray(xb), False, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(y_fold), np.asarray(y_add), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mut_fold["batch_stats"]["mean"]),
        np.asarray(mut_add["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)
    assert (np.asarray(y_fold) >= 0).all()  # relu fused
