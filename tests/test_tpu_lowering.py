"""AOT Mosaic lowering checks — TPU kernel validity without a TPU.

Pallas→Mosaic lowering (block-shape legality, layout rules, op support)
happens CLIENT-side in ``jax.jit(...).trace(...).lower(
lowering_platforms=("tpu",))``; only the final XLA compile needs the
backend. Interpret-mode tests cannot catch Mosaic constraint violations
(e.g. the (1, F)-block-over-(B, F)-array rejection this file was born
from), so every new kernel's production shapes are lowered here on CPU.
"""

import functools

import jax
import jax.numpy as jnp
import pytest


def _lowers(fn, *args):
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize("b,n,f", [(65, 2048, 1024), (33, 2048, 1024)])
def test_moments_kernels_lower(b, n, f):
    import fpsg_tpu.ops.moments as mm

    y = jnp.zeros((b, n, f), jnp.bfloat16)
    s = jnp.zeros((f,), jnp.float32)
    _lowers(functools.partial(mm._moments_fwd_pallas, interpret=False), y, s)
    gz = jnp.zeros((f,), jnp.float32)
    gm = jnp.zeros((b, f), jnp.float32)
    im = jnp.zeros((b, f), jnp.int32)
    _lowers(functools.partial(mm._moments_bwd_pallas, interpret=False),
            y, s, gz, gz, gm, im, gm, im)


@pytest.mark.parametrize("b,h,w2,c2", [
    (33, 224, 112, 128),   # block 1 (space-to-depth packed)
    (33, 112, 56, 256),    # conv2_2
    (33, 56, 28, 512),     # conv3_3
    (33, 28, 14, 1024),    # conv4_3
    (33, 14, 7, 1024),     # conv5_3 (odd W/2, odd H/2)
])
def test_pool_moments_kernels_lower(b, h, w2, c2):
    import fpsg_tpu.ops.pool_moments as pm

    y = jnp.zeros((b, h, w2, c2), jnp.bfloat16)
    s = jnp.zeros((c2,), jnp.float32)
    _lowers(functools.partial(pm._fwd_pallas, interpret=False), y, s)
    gz = jnp.zeros((c2,), jnp.float32)
    gq = jnp.zeros((b, h // 2, w2, c2 // 2), jnp.float32)
    iq = jnp.zeros((b, h // 2, w2, c2 // 2), jnp.int8)
    _lowers(functools.partial(pm._bwd_pallas, interpret=False),
            y, s, gz, gz, gq, iq, gq, iq)


@pytest.mark.parametrize("b,h,w,cin,cout", [
    (65, 224, 112, 128, 128),   # block-1 packed conv1_2 equivalent
    (65, 112, 112, 128, 128),   # conv2_x
    (65, 56, 56, 256, 256),     # conv3_x
    (65, 28, 28, 512, 512),     # conv4_x
    (65, 14, 14, 512, 512),     # conv5_x
])
def test_conv3x3_kernels_lower(b, h, w, cin, cout):
    import fpsg_tpu.ops.conv3x3 as cv

    x = jnp.zeros((b, h, w, cin), jnp.bfloat16)
    wk = jnp.zeros((9 * cin, cout), jnp.bfloat16)
    gy = jnp.zeros((b, h, w, cout), jnp.bfloat16)
    y = jnp.zeros((b, h, w, cout), jnp.bfloat16)
    ci = jnp.zeros((cin,), jnp.float32)
    co = jnp.zeros((cout,), jnp.float32)
    wkr = jnp.zeros((9 * cout, cin), jnp.bfloat16)
    for has_pro in (False, True):
        for has_epi in (False, True):
            _lowers(functools.partial(
                cv._conv_fwd_pallas, has_pro=has_pro, has_epi=has_epi,
                interpret=False), x, ci, ci, wk, co)
            _lowers(functools.partial(
                cv._conv_dgrad_pallas, has_pro=has_pro, has_epi=has_epi,
                interpret=False), gy, y, x, ci, ci, wkr, co, co, co)
            _lowers(functools.partial(
                cv._conv_wgrad_pallas, has_pro=has_pro, has_epi=has_epi,
                interpret=False), x, ci, ci, gy, y, co, co, co)
    # combined backward (one kernel) at the block-1..3 shapes its VMEM
    # gate admits
    th = cv._combined_row_tile(h, w, cin, cout)
    if th is not None:
        _lowers(functools.partial(
            cv._conv_cbwd_pallas, has_pro=True, has_epi=True,
            interpret=False, row_tile=th), gy, y, x, ci, ci, wkr,
            co, co, co)
    # the train step vmaps episodes (even at E=1): the fused fwd must
    # also lower under the pallas batching rule
    xe = jnp.zeros((2,) + x.shape, jnp.bfloat16)

    def vmapped(xe, wk):
        return jax.vmap(
            lambda xx: cv._conv_fwd_pallas(
                xx, ci, ci, wk, co, has_pro=True, has_epi=True,
                interpret=False)
        )(xe)

    _lowers(vmapped, xe, wk)


@pytest.mark.slow
def test_full_production_train_step_lowers(monkeypatch):
    """The bench.py configuration (bf16 flagship, 32-shot, 224², 2048
    pts) with every Pallas kernel forced onto its TPU path, vmapped and
    differentiated, lowers to Mosaic end-to-end."""
    import unittest.mock as mock

    import __graft_entry__ as g
    import fpsg_tpu.nn.pointnet as pn
    import fpsg_tpu.nn.vgg as vgg
    import fpsg_tpu.ops.moments as mm
    import fpsg_tpu.ops.pool_moments as pm
    from fpsg_tpu.data import DeviceCorpus, synthetic_corpus
    from fpsg_tpu.models import ImgPCProtoNet
    from fpsg_tpu.train import TrainState, init_model, make_optimizer
    from fpsg_tpu.train.step import make_train_step

    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet", intra_support=True,
        dtype=jnp.bfloat16, fused_conv=True,
    )
    sample = g._example_sample(32, 1, 224, 2048, jax.random.PRNGKey(0))
    # init EXECUTES on CPU — keep kernels in interpret mode for it; only
    # the (pure) trace/lower below runs with the TPU kernel paths forced
    variables = init_model(model, sample)
    tx = make_optimizer(lr=1e-3, steps_per_epoch=100)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    corpus = DeviceCorpus.build(
        synthetic_corpus(n_classes=3, items_per_class=40, n_pts=2048,
                         img_size=224))

    monkeypatch.setattr(mm, "interpret_default", lambda: False)
    monkeypatch.setattr(pm, "interpret_default", lambda: False)
    monkeypatch.setattr(vgg, "_FORCE_POOL_KERNEL", True)
    monkeypatch.setattr(pn, "_FORCE_MOMENTS_KERNEL", True)
    # fused conv chain: vgg gates on its own interpret_default and
    # passes it down to conv_bn_fused
    monkeypatch.setattr(vgg, "interpret_default", lambda: False)
    monkeypatch.setattr(vgg, "_FORCE_CONV_KERNEL", True)
    monkeypatch.setattr(vgg, "_FC_SKIP", frozenset())

    # n_episodes=2: the kernels also lower under the vmap batching rule
    # (batch grid dim + per-episode accumulator blocks)
    step = make_train_step(model, tx, n_support=32, n_query=1,
                           n_episodes=2, donate=False, steps_per_call=1)
    jax.jit(step).trace(
        state, corpus, jax.random.PRNGKey(1)
    ).lower(lowering_platforms=("tpu",))
