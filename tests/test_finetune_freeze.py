"""--finetune_layer: the reference's intended (never-wired) VGG freeze."""

import jax
import jax.numpy as jnp
import numpy as np

from fpsg_tpu.models import ImgPCProtoNet
from fpsg_tpu.train import init_model
from fpsg_tpu.train.optim import make_optimizer, vgg_finetune_mask


def test_mask_keeps_last_n_convs_trainable(rng):
    model = ImgPCProtoNet(
        img_backbone="vgg_16", num_clusters=2, num_nodes=2, num_points=64,
    )
    sample = {
        "xs": jnp.zeros((2, 32, 32, 3)),
        "xq": jnp.zeros((1, 32, 32, 3)),
        "xad": jnp.zeros((2, 32, 32, 3)),
        "pcs": jnp.zeros((2, 64, 3)),
        "pcq": jnp.zeros((1, 64, 3)),
        "pcad": jnp.zeros((2, 64, 3)),
    }
    variables = init_model(model, sample)
    params = variables["params"]
    mask = vgg_finetune_mask(params, finetune_layer=3)

    enc = params["img_encoder"]["encoder"]
    conv_ids = sorted(
        int(n.split("_")[1]) for n in enc
        if n.startswith("features_") and "kernel" in enc[n]
    )
    assert len(conv_ids) == 13
    kept = set(conv_ids[-3:])
    menc = mask["img_encoder"]["encoder"]
    for name in enc:
        idx = int(name.split("_")[1])
        conv_idx = idx if idx in conv_ids else idx - 1
        frozen = jax.tree.leaves(menc[name])[0]
        assert frozen == (conv_idx not in kept), (name, frozen)
    # everything outside the image encoder trains
    assert not any(jax.tree.leaves(mask["pc_decoder"]))

    # frozen params receive zero updates
    tx = make_optimizer(frozen_mask=mask)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    first_conv = f"features_{conv_ids[0]}"
    last_conv = f"features_{conv_ids[-1]}"
    assert np.all(
        np.asarray(updates["img_encoder"]["encoder"][first_conv]["kernel"])
        == 0
    )
    assert np.any(
        np.asarray(updates["img_encoder"]["encoder"][last_conv]["kernel"])
        != 0
    )
    assert np.any(np.asarray(
        jax.tree.leaves(updates["pc_decoder"])[0]) != 0)
