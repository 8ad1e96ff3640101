"""End-to-end model tests: loss/reconstruct/generate on a tiny episode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpsg_tpu.models import ImgPCProtoNet


def tiny_model(**kw):
    defaults = dict(
        img_backbone="tiny",
        pc_backbone="pointnet",
        num_clusters=2,
        num_nodes=2,
        num_points=128,
        bottleneck_size=1536,
    )
    defaults.update(kw)
    return ImgPCProtoNet(**defaults)


def tiny_episode(rng, s=4, q=1, n=128, img=32):
    f = lambda *shape: jnp.array(rng.standard_normal(shape), jnp.float32)
    return {
        "xs": f(s, img, img, 3),
        "xq": f(q, img, img, 3),
        "xad": f(s, img, img, 3),
        "pcs": f(s, n, 3) * 0.3,
        "pcq": f(q, n, 3) * 0.3,
        "pcad": f(s, n, 3) * 0.3,
    }


def init_model(model, sample):
    return model.init(
        {"params": jax.random.PRNGKey(0),
         "template": jax.random.PRNGKey(1)},
        sample, True,
    )


def test_loss_keys_and_finiteness(rng):
    model = tiny_model()
    sample = tiny_episode(rng)
    variables = init_model(model, sample)
    out, _ = model.apply(
        variables, sample, True, mutable=["batch_stats"],
        rngs={"template": jax.random.PRNGKey(2)},
    )
    assert set(out) == {
        "ttl_loss", "recon_loss", "query_rec_loss", "support_rec_loss"}
    assert np.isfinite(float(out["ttl_loss"]))
    # intra off → support loss exactly 0 (reference _ZERO_HOLDER path)
    assert float(out["support_rec_loss"]) == 0.0
    assert float(out["ttl_loss"]) == float(out["query_rec_loss"])


def test_intra_support_and_factors(rng):
    model = tiny_model(intra_support=True, query_factor=2.0,
                       support_factor=0.5)
    sample = tiny_episode(rng)
    variables = init_model(model, sample)
    out, _ = model.apply(
        variables, sample, True, mutable=["batch_stats"],
        rngs={"template": jax.random.PRNGKey(2)},
    )
    assert float(out["support_rec_loss"]) > 0.0
    np.testing.assert_allclose(
        float(out["ttl_loss"]),
        2.0 * float(out["query_rec_loss"])
        + 0.5 * float(out["support_rec_loss"]),
        rtol=1e-6,
    )


def test_reconstruct_and_generate(rng):
    model = tiny_model()
    sample = tiny_episode(rng, q=2)
    variables = init_model(model, sample)
    out = model.apply(
        variables, sample, method=model.reconstruct,
        rngs={"template": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(out["cd_loss"]))
    assert np.isfinite(float(out["emd_loss"]))
    assert out["syn_pc"].shape == (2, 128, 3)

    syn = model.apply(
        variables, sample, method=model.generate,
        rngs={"template": jax.random.PRNGKey(2)},
    )
    assert syn.shape == (2, 128, 3)


def test_loss_decreases_under_sgd(rng):
    """Minimum end-to-end slice (SURVEY.md §7): a few grad steps reduce CD."""
    model = tiny_model()
    sample = tiny_episode(rng)
    variables = init_model(model, sample)
    params, batch_stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def step(params, batch_stats, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                sample, True, mutable=["batch_stats"],
                rngs={"template": key},
            )
            return out["ttl_loss"], mut["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params = jax.tree.map(lambda p, g: p - 1e-3 * g, params, grads)
        return params, bs, loss

    losses = []
    for i in range(8):
        params, batch_stats, loss = step(
            params, batch_stats, jax.random.PRNGKey(10 + i)
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_dgcnn_backbone(rng):
    model = tiny_model(pc_backbone="dgcnn")
    sample = tiny_episode(rng)
    variables = init_model(model, sample)
    out, _ = model.apply(
        variables, sample, True, mutable=["batch_stats"],
        rngs={"template": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(out["ttl_loss"]))


def test_bad_aggregate_raises(rng):
    with pytest.raises(Exception):
        m = tiny_model(aggregate="bogus")
        m.init(
            {"params": jax.random.PRNGKey(0),
             "template": jax.random.PRNGKey(1)},
            tiny_episode(rng), True,
        )


def test_emd_metric_trains(rng):
    model = tiny_model(metric="emd")
    sample = tiny_episode(rng, n=64)
    variables = init_model(model, sample)
    out, _ = model.apply(
        variables, sample, True, mutable=["batch_stats"],
        rngs={"template": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(out["ttl_loss"]))


def test_mask_single_aggregate(rng):
    """mask_single: FCMaskAllocater gates the prototype (extension of the
    reference's declared-but-unwired mode)."""
    model = tiny_model(aggregate="mask_single")
    sample = tiny_episode(rng)
    variables = init_model(model, sample)
    assert "mask_allocater" in variables["params"]
    out, _ = model.apply(
        variables, sample, True, mutable=["batch_stats"],
        rngs={"template": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(out["ttl_loss"]))

    # the mask actually changes the loss vs 'single' with shared weights
    single = tiny_model(aggregate="single")
    vars_single = {
        "params": {k: v for k, v in variables["params"].items()
                   if k != "mask_allocater"},
        "batch_stats": {k: v for k, v in variables["batch_stats"].items()
                        if k != "mask_allocater"},
    }
    out_single, _ = single.apply(
        vars_single, sample, True, mutable=["batch_stats"],
        rngs={"template": jax.random.PRNGKey(2)},
    )
    assert float(out["ttl_loss"]) != float(out_single["ttl_loss"])
