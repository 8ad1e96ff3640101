"""Failure containment: a crash mid-training persists an emergency
checkpoint (with optimizer state) that --resume continues from."""

import os

import numpy as np
import pytest

from fpsg_tpu.config import FPSGConfig
from fpsg_tpu.data import generate_modelnet_manifests, materialize_fake_modelnet


@pytest.fixture()
def tiny_conf(tmp_path):
    img_root, pc_root = materialize_fake_modelnet(
        str(tmp_path), classes=["cube"], items_per_class=4,
        n_pts=64, img_size=64,
    )
    out = str(tmp_path / "m") + "/"
    generate_modelnet_manifests(img_root, pc_root, out,
                                train_classes=["cube"], test_classes=[])
    return FPSGConfig(
        config_path=out + "modelnet_train.txt",
        test_path=out + "modelnet_train.txt",
        refer_path=out + "modelnet_files/",
        img_encoder="tiny", n_shot=2, n_query=1, num_pts=64,
        n_episode=2, epoch=3, eval_interval=10, save_interval=10,
        sample_interval=10, name="crash", model_path=str(tmp_path / "ck"),
        # one optimizer step per dispatch so the injected failure below
        # lands on the intended step count (the default fuses steps via
        # lax.scan, changing the number of dispatches per epoch)
        steps_per_call=1,
        # fail-fast: this test exercises the emergency-checkpoint path,
        # not the in-process replay (tests/test_transient_retry.py)
        transient_retries=0,
    )


def test_crash_writes_emergency_checkpoint_and_resume(tiny_conf, monkeypatch):
    import fpsg_tpu.train.loop as loop_mod

    real_make = loop_mod.make_train_step
    calls = {"n": 0}

    def flaky_make(*args, **kwargs):
        step = real_make(*args, **kwargs)

        def wrapped(state, corpus, key):
            calls["n"] += 1
            if calls["n"] == 4:  # die inside epoch 2
                raise RuntimeError("injected failure")
            return step(state, corpus, key)

        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", flaky_make)
    with pytest.raises(RuntimeError, match="injected failure"):
        loop_mod.train_network(tiny_conf)

    run_dir = os.path.join(tiny_conf.model_path, tiny_conf.name)
    saved = [f for f in os.listdir(run_dir) if f.startswith("model_epoch_")]
    assert saved, os.listdir(run_dir)

    # resume from the emergency checkpoint and finish
    monkeypatch.setattr(loop_mod, "make_train_step", real_make)
    epoch = int(sorted(saved)[0].split("_")[-1].split(".")[0])
    tiny_conf.resume = epoch
    state = loop_mod.train_network(tiny_conf)
    assert int(np.asarray(state.step)) > 0
