"""K-step OPTIMIZER-TRAJECTORY parity vs the weight-synced torch replica.

VERDICT r3 item 3: single-step parity (test_full_step_parity.py) cannot
catch errors that only show up through the optimizer — wrong Adam bias
correction, a mis-stepped LR schedule, running stats mutated at the
wrong point of the epoch. Evidence here, in ``precise_stats`` mode:

1. **10-step SGD(+weight-decay)+StepLR trajectory, control-bounded.**
   SGD updates are proportional to the gradient (no lr-scale noise
   amplification), but the loss surface is still near-tie chaotic:
   the jax trajectory re-run with one weight nudged 1e-7 (or under a
   different XLA thread configuration) moves mid-window losses by
   percent. Losses, params, and the eval loss are asserted within 3x
   that measured self-sensitivity control; the schedule's two halvings
   are asserted exactly.
2. **One-Adam-step update parity, elementwise.** The first Adam update
   is compared per element wherever the torch gradient is above the
   cross-framework noise floor; Adam's |update| <= lr/(1-b1) invariant
   is asserted everywhere.
3. **10-step Adam trajectory, chaos-bounded.** Adam normalizes each
   update to ~lr regardless of gradient size, so parameters whose true
   gradient sits below the noise floor get SIGN-RANDOM +-lr updates —
   the trajectory is intrinsically chaotic. Measured control: the torch
   replica vs ITSELF with ONE weight perturbed by 1e-7 diverges 3.7% in
   train loss by step 1 and up to ~80% by step 5 (same code, same data,
   same seeds). No implementation can track tighter than the
   reference's own sensitivity, so the documented bound is the measured
   control envelope: the jax-vs-torch divergence must stay within 3x
   the torch-vs-torch(+1e-7) divergence at every step.

The one semantic divergence is removed at the source in all three: a
conv/linear bias immediately before a train-mode BN has ANALYTICALLY
zero gradient (normalization subtracts constant shifts). We hold those
biases fixed; torch backprops ~1e-10 cancellation noise (which Adam
would amplify into an lr-scale random walk of function-irrelevant
parameters — PARITY.md round-2 table), so the torch loops zero those
bias grads before stepping.

Reference trajectory semantics: src/trainNetwork.py:118-154 (Adam or
--SGD with weight_decay 1e-2, StepLR gamma 0.5 stepped per epoch).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from fpsg_tpu.models import ImgPCProtoNet
from fpsg_tpu.train.optim import make_optimizer

from test_full_step_parity import (
    C, IMG, NN_, NPTS, PPN, Q, S, BOTT, W_DEF, D,
    TorchPointNetFeat, copy_pointnet, copy_vgg, run_torch_loss,
)
from test_golden_parity import TorchVGG, build_torch_decoder

K_STEPS = 10
LR = 1e-3        # Adam legs: the reference's default
SGD_LR = 1e-5    # SGD leg: at lr=1e-3 the raw-gradient steps (|g| up
                 # to ~13 on params of scale ~0.05) move params 25% per
                 # step — the TRAJECTORY itself is dynamics-chaotic and
                 # torch-vs-torch would diverge too. 1e-5 keeps the
                 # 10-step path in the stable regime where tracking is
                 # a property of the implementation, not of luck.
DECAY_EVERY = 4  # epochs; 1 step/epoch here -> lr halves at steps 4, 8


def _episode(rng):
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    sample = {
        "xs": f32(S, IMG, IMG, 3),
        "xq": f32(Q, IMG, IMG, 3),
        "xad": f32(S, IMG, IMG, 3),
        "pcs": f32(S, NPTS, 3) * 0.3,
        "pcq": f32(Q, NPTS, 3) * 0.3,
        "pcad": f32(S, NPTS, 3) * 0.3,
    }
    raw_q = rng.uniform(0, 1, (Q, C, NN_, PPN, 2)).astype(np.float32)
    raw_s = rng.uniform(0, 1, (S, C, NN_, PPN, 2)).astype(np.float32)
    return sample, raw_q, raw_s


def _torch_params(tm_vgg, tm_pn, deformers, nodes):
    mods = [tm_vgg, tm_pn]
    for dl in deformers:
        mods.extend(dl.values())
    for cl in nodes:
        for nl in cl:
            mods.extend(nl.values())
    params, seen = [], set()
    for m in mods:
        for p in m.parameters():
            if id(p) not in seen:
                seen.add(id(p))
                params.append(p)
    return params


def _pre_bn_biases(tm_vgg, tm_pn, deformers, nodes):
    """Every conv/linear bias whose module output feeds straight into a
    BatchNorm (train-mode gradient is analytically zero; see module
    docstring)."""
    biases = []
    for m in tm_vgg.features:
        if isinstance(m, torch.nn.Conv2d):
            biases.append(m.bias)
    pn = tm_pn
    for m in (pn.conv1, pn.conv2, pn.conv3, pn.stn.conv1, pn.stn.conv2,
              pn.stn.conv3, pn.stn.fc1, pn.stn.fc2):
        biases.append(m.bias)
    for dl in deformers:
        biases.extend([dl["conv1"].bias, dl["conv2"].bias])  # conv3: tanh
    for cl in nodes:
        for nl in cl:
            biases.extend(
                [nl["conv1"].bias, nl["conv2"].bias, nl["conv3"].bias])
    return biases


def _build_synced(seed=11):
    rng = np.random.default_rng(seed)
    model = ImgPCProtoNet(
        img_backbone="vgg_16", pc_backbone="pointnet",
        num_clusters=C, num_nodes=NN_, num_points=NPTS,
        bottleneck_size=BOTT, intra_support=True, precise_stats=True,
    )
    sample0, raw_q0, raw_s0 = _episode(rng)
    jb0 = {k: jnp.asarray(v) for k, v in sample0.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "template": jax.random.PRNGKey(1)}, jb0, True)
    params = variables["params"]

    tm_vgg = TorchVGG()
    copy_vgg(tm_vgg, params["img_encoder"]["encoder"])
    tm_pn = TorchPointNetFeat()
    copy_pointnet(
        tm_pn,
        params["pc_encoder_wrap"]["pc_encoder"]["pointnet_feat_extractor"])
    deformers, nodes = build_torch_decoder(
        params["pc_decoder"], C, NN_, 2, W_DEF, D)
    return (rng, model, params, variables["batch_stats"],
            (sample0, raw_q0, raw_s0), tm_vgg, tm_pn, deformers, nodes)


def _torch_trajectory(rng, tm_vgg, tm_pn, deformers, nodes, *, sgd,
                      k_steps=K_STEPS, perturb=False):
    tparams = _torch_params(tm_vgg, tm_pn, deformers, nodes)
    if perturb:  # chaos control: one weight nudged one f32 ulp-ish
        with torch.no_grad():
            tm_vgg.features[7].weight[0, 0, 0, 0] += 1e-7
    zero_biases = _pre_bn_biases(tm_vgg, tm_pn, deformers, nodes)
    if sgd:
        opt = torch.optim.SGD(tparams, lr=SGD_LR, weight_decay=1e-2)
    else:
        opt = torch.optim.Adam(tparams, lr=LR, betas=(0.9, 0.999),
                               eps=1e-8)
    sched = torch.optim.lr_scheduler.StepLR(
        opt, step_size=DECAY_EVERY, gamma=0.5)
    losses = []
    for _ in range(k_steps):
        sample, raw_q, raw_s = _episode(rng)
        opt.zero_grad()
        ttl, _, _ = run_torch_loss(
            tm_vgg, tm_pn, deformers, nodes, sample, raw_q, raw_s,
            train=True)
        ttl.backward()
        with torch.no_grad():
            for b in zero_biases:
                if b.grad is not None:
                    b.grad.zero_()
        opt.step()
        sched.step()
        losses.append(float(ttl.detach()))
    return losses, sched


def _jax_trajectory(rng, model, params, stats, *, sgd, k_steps=K_STEPS,
                    perturb=False):
    if perturb:  # self-sensitivity control: one weight nudged 1e-7
        params = jax.tree.map(lambda x: x, params)
        k = params["img_encoder"]["encoder"]["features_7"]["kernel"]
        params["img_encoder"]["encoder"]["features_7"]["kernel"] = \
            k.at[0, 0, 0, 0].add(1e-7)
    tx = make_optimizer(lr=SGD_LR if sgd else LR, sgd=sgd,
                        lr_decay_epochs=DECAY_EVERY, steps_per_epoch=1)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, jb, tp):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, jb, True, tp,
                method="loss", mutable=["batch_stats"])
            return out["ttl_loss"], mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats,
                opt_state, loss)

    losses = []
    for _ in range(k_steps):
        sample, raw_q, raw_s = _episode(rng)
        jb = {k: jnp.asarray(v) for k, v in sample.items()}
        tp = {"query": jnp.asarray(raw_q), "support": jnp.asarray(raw_s)}
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jb, tp)
        losses.append(float(loss))
    return losses, params, stats


@pytest.mark.slow
def test_10_step_sgd_steplr_trajectory_tracks_torch():
    """Trajectory evidence with a numerically stable optimizer: SGD +
    the reference's weight_decay 1e-2 + StepLR halving twice inside the
    window.

    Bounds are SELF-CALIBRATED against the measured near-tie floor:
    maxpool/argmin/relu near-ties (values within ~1e-7) are abundant in
    this architecture, and every flip re-routes an O(1) cotangent —
    measured: OUR OWN trajectory re-run with ONE weight nudged 1e-7
    (or merely under a different XLA thread configuration) moves
    mid-window losses by several percent, even at SGD_LR. So the loss
    criterion is a 3x multiple of that measured self-sensitivity
    control, and the param criterion compares jax-vs-torch aggregate
    drift against the jax-vs-jax(+1e-7) control's. Systematic errors —
    a missed lr halving, wrong weight decay — shift every element of
    every leaf far beyond the control envelope."""
    (rng, model, params, stats, ep0,
     tm_vgg, tm_pn, deformers, nodes) = _build_synced()
    sample0, raw_q0, raw_s0 = ep0

    rng_t = np.random.default_rng(99)
    rng_j = np.random.default_rng(99)
    rng_c = np.random.default_rng(99)
    losses_t, sched = _torch_trajectory(
        rng_t, tm_vgg, tm_pn, deformers, nodes, sgd=True)
    losses_j, params_j, stats_j = _jax_trajectory(
        rng_j, model, params, stats, sgd=True)
    losses_c, params_c, _stats_c = _jax_trajectory(
        rng_c, model, params, stats, sgd=True, perturb=True)

    div_ours = max(abs(a - b) / abs(b)
                   for a, b in zip(losses_j, losses_t))
    div_ctrl = max(abs(a - b) / abs(b)
                   for a, b in zip(losses_c, losses_j))
    assert div_ours < max(3.0 * div_ctrl, 1e-3), (
        f"SGD loss divergence {div_ours:.4f} vs self-sensitivity "
        f"control {div_ctrl:.4f}\n jax {losses_j}\n torch {losses_t}")
    # step 0 is pre-update: tight regardless
    np.testing.assert_allclose(losses_j[0], losses_t[0], rtol=3e-4)

    checks = [
        ("vgg features_0.kernel",
         np.transpose(np.asarray(
             params_j["img_encoder"]["encoder"]["features_0"]["kernel"]),
             (3, 2, 0, 1)),
         tm_vgg.features[0].weight.detach().numpy()),
        ("vgg features_1.scale (BN weight)",
         np.asarray(
             params_j["img_encoder"]["encoder"]["features_1"]["scale"]),
         tm_vgg.features[1].weight.detach().numpy()),
        ("pointnet conv1.kernel",
         np.asarray(params_j["pc_encoder_wrap"]["pc_encoder"]
                    ["pointnet_feat_extractor"]["conv1"]["kernel"]).T,
         tm_pn.conv1.weight.detach().numpy()[:, :, 0]),
        ("stn fc3.bias (no BN after — real gradient)",
         np.asarray(params_j["pc_encoder_wrap"]["pc_encoder"]
                    ["pointnet_feat_extractor"]["stn"]["fc3"]["bias"]),
         tm_pn.stn.fc3.bias.detach().numpy()),
        ("node_conv1[0,0].kernel",
         np.asarray(params_j["pc_decoder"]["node_conv1"]["kernel"])
         [0, 0].T,
         nodes[0][0]["conv1"].weight.detach().numpy()[:, :, 0]),
        ("deformer_conv1[0].kernel",
         np.asarray(params_j["pc_decoder"]["deformer_conv1"]["kernel"])
         [0].T,
         deformers[0]["conv1"].weight.detach().numpy()[:, :, 0]),
    ]
    # control leaves, same extraction paths as `checks`
    def leaf(params_x, path):
        node = params_x
        for p in path:
            node = node[p]
        return np.asarray(node)

    ctrl_paths = [
        ("img_encoder", "encoder", "features_0", "kernel"),
        ("img_encoder", "encoder", "features_1", "scale"),
        ("pc_encoder_wrap", "pc_encoder", "pointnet_feat_extractor",
         "conv1", "kernel"),
        ("pc_encoder_wrap", "pc_encoder", "pointnet_feat_extractor",
         "stn", "fc3", "bias"),
        ("pc_decoder", "node_conv1", "kernel"),
        ("pc_decoder", "deformer_conv1", "kernel"),
    ]
    assert len(ctrl_paths) == len(checks)  # keep lists in sync
    for (name, ours, theirs), path in zip(checks, ctrl_paths):
        scale = max(np.abs(theirs).max(), 1e-8)
        d = np.abs(ours - theirs).mean() / scale
        d_ctrl = np.abs(
            leaf(params_j, path) - leaf(params_c, path)).mean() / scale
        assert d < max(3.0 * d_ctrl, 1e-6), (
            f"SGD param trajectory drift beyond control: {name} "
            f"mean {d:.2e} vs control {d_ctrl:.2e}")

    # running stats carried through 10 updates -> eval-mode loss
    jb0 = {k: jnp.asarray(v) for k, v in sample0.items()}
    out_eval = model.apply(
        {"params": params_j, "batch_stats": stats_j}, jb0, False,
        {"query": jnp.asarray(raw_q0), "support": jnp.asarray(raw_s0)},
        method="loss")
    with torch.no_grad():
        ttl_te, _, _ = run_torch_loss(
            tm_vgg, tm_pn, deformers, nodes, sample0, raw_q0, raw_s0,
            train=False)
    np.testing.assert_allclose(
        float(out_eval["ttl_loss"]), float(ttl_te),
        rtol=max(3.0 * div_ctrl, 1e-3),
        err_msg="eval-mode loss after the 10-step SGD trajectory "
                "(bound: 3x the measured self-sensitivity control)")

    # the schedule really halved twice
    assert abs(sched.get_last_lr()[0]
               - SGD_LR * 0.5 ** (K_STEPS // DECAY_EVERY)) < 1e-15


@pytest.mark.slow
def test_one_adam_step_update_parity_elementwise():
    """The first Adam update compared per element where the gradient is
    resolvable: catches a wrong bias correction or eps placement, which
    a chaotic multi-step run cannot pin."""
    (rng, model, params, stats, _ep0,
     tm_vgg, tm_pn, deformers, nodes) = _build_synced()

    rng_t = np.random.default_rng(55)
    rng_j = np.random.default_rng(55)
    before = tm_vgg.features[0].weight.detach().numpy().copy()
    _torch_trajectory(rng_t, tm_vgg, tm_pn, deformers, nodes,
                      sgd=False, k_steps=1)
    upd_t = tm_vgg.features[0].weight.detach().numpy() - before
    # rebuild torch grads for the mask (the optimizer consumed them)
    g_t = tm_vgg.features[0].weight.grad.numpy()

    before_j = np.asarray(
        params["img_encoder"]["encoder"]["features_0"]["kernel"])
    _losses, params_j, _stats = _jax_trajectory(
        rng_j, model, params, stats, sgd=False, k_steps=1)
    upd_j = np.transpose(
        np.asarray(
            params_j["img_encoder"]["encoder"]["features_0"]["kernel"])
        - before_j, (3, 2, 0, 1))

    # Adam invariant: first-step |update| <= lr (m_hat/sqrt(v_hat) = 1
    # for any constant gradient) up to eps slack
    assert np.abs(upd_j).max() <= LR * 1.001
    assert np.abs(upd_t).max() <= LR * 1.001
    # elementwise parity where torch's gradient is above the measured
    # cross-framework noise floor (~1e-3 of leaf max)
    mask = np.abs(g_t) > 1e-2 * np.abs(g_t).max()
    assert mask.sum() > 100  # the comparison is not vacuous
    np.testing.assert_allclose(
        upd_j[mask], upd_t[mask], atol=LR * 5e-3,
        err_msg="first Adam update mismatch on resolvable gradients")


@pytest.mark.slow
def test_10_step_adam_trajectory_within_measured_chaos_envelope():
    """Adam trajectory divergence vs torch must be the same ORDER as
    torch's own sensitivity to a 1e-7 single-weight nudge (see module
    docstring — sign-random +-lr updates on sub-noise gradients make
    tighter tracking impossible for ANY implementation, including a
    second torch build)."""
    (rng, model, params, stats, _ep0,
     tm_vgg, tm_pn, deformers, nodes) = _build_synced()
    import copy

    tm_vgg2, tm_pn2 = copy.deepcopy(tm_vgg), copy.deepcopy(tm_pn)
    deformers2, nodes2 = copy.deepcopy(deformers), copy.deepcopy(nodes)

    rng_a = np.random.default_rng(77)
    rng_b = np.random.default_rng(77)
    rng_j = np.random.default_rng(77)
    losses_t, _ = _torch_trajectory(
        rng_a, tm_vgg, tm_pn, deformers, nodes, sgd=False)
    losses_ctrl, _ = _torch_trajectory(
        rng_b, tm_vgg2, tm_pn2, deformers2, nodes2, sgd=False,
        perturb=True)
    losses_j, _params, _stats = _jax_trajectory(
        rng_j, model, params, stats, sgd=False)

    div_ours = max(abs(a - b) / abs(b)
                   for a, b in zip(losses_j, losses_t))
    div_ctrl = max(abs(a - b) / abs(b)
                   for a, b in zip(losses_ctrl, losses_t))
    assert div_ctrl > 1e-3, (
        "control did not diverge — chaos premise changed, tighten the "
        f"bound (control divergence {div_ctrl:.2e})")
    assert div_ours < 3.0 * div_ctrl, (
        f"jax-vs-torch Adam divergence {div_ours:.3f} exceeds 3x the "
        f"torch-vs-torch(+1e-7) control envelope {div_ctrl:.3f}")
    # step 0 is pre-update and must match tightly regardless
    np.testing.assert_allclose(losses_j[0], losses_t[0], rtol=3e-4)
