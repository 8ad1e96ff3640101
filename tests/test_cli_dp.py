"""CLI-level mesh parallelism: --dp/--mp/--fsdp through train_network.

The reference trainer is single-GPU (SURVEY.md §2.6); these tests pin the
production driver's multi-chip path on the 8-device CPU mesh:

1. --dp 2 trains, checkpoints, and resumes end-to-end,
2. the dp=2 run's final params match the single-device run bit-for-tol
   (sharding is an execution detail, not a semantics change),
3. --fsdp checkpoints WITHOUT a host gather (sharded Orbax save) and
   resumes through the sharded restore path,
4. invalid combinations fail fast with actionable errors.
"""

import os

import jax
import numpy as np
import pytest

from fpsg_tpu.data import generate_modelnet_manifests, materialize_fake_modelnet


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_modelnet_dp")
    img_root, pc_root = materialize_fake_modelnet(
        str(root), classes=["cube", "sphere", "cylinder"],
        items_per_class=6, n_pts=128, img_size=600,
    )
    out = str(root / "manifests") + "/"
    generate_modelnet_manifests(
        img_root, pc_root, out,
        train_classes=["cube", "sphere"], test_classes=["cylinder"],
    )
    return out


def _args(out, ckpt_dir, name, epochs=2, extra=()):
    return [
        "--config_path", out + "modelnet_train.txt",
        "--test_path", out + "modelnet_test.txt",
        "--refer_path", out + "modelnet_files/",
        "--pc_encoder_path", "NONE",
        "--img_encoder", "tiny",
        "--n_shot", "3", "--n_query", "1",
        "--num_pts", "128",
        # smallest decoder that still exercises every dp/fsdp path: the
        # default 4x4x1536 stacks tripled this file's wall time (~23 min
        # measured round-5) purely in compile+run width, pinning nothing
        # extra — mesh build, sharding, Orbax round-trips, resume are
        # width-independent
        "--num_clusters", "2", "--num_nodes", "2",
        "--bottleneck_size", "192",
        "--n_episode", "4",
        "--epoch", str(epochs),
        "--eval_interval", "100",
        "--save_interval", "2",
        "--sample_interval", "100",
        "--eval_episodes", "4",
        "--name", name,
        "--model_path", ckpt_dir,
        *extra,
    ]


def _log_text(run_dir):
    logs = [f for f in os.listdir(run_dir) if f.startswith("log_")]
    assert logs, os.listdir(run_dir)
    return open(os.path.join(run_dir, logs[0])).read()


def _ckpt_params(run_dir, epoch):
    from fpsg_tpu.io.checkpoints import restore_checkpoint_raw

    return restore_checkpoint_raw(
        os.path.join(run_dir, f"model_epoch_{epoch}")
    )


def test_train_cli_dp2_runs_and_resumes(fake_dataset, tmp_path):
    from fpsg_tpu.cli.trainNetwork import main as train_main

    ckpt_dir = str(tmp_path / "dp2")
    extra = ["--dp", "2", "--episodes_per_step", "2"]
    train_main(_args(fake_dataset, ckpt_dir, "dp2", extra=extra))
    run_dir = os.path.join(ckpt_dir, "dp2")
    text = _log_text(run_dir)
    assert "Mesh: dp=2 x mp=1" in text
    assert "Training Results for Epoch -- 2" in text
    assert any(f.startswith("model_epoch_2") for f in os.listdir(run_dir))

    train_main(_args(fake_dataset, ckpt_dir, "dp2", epochs=3,
                     extra=extra + ["--resume", "2"]))
    assert any(f.startswith("model_epoch_3") for f in os.listdir(run_dir))


def test_dp2_matches_single_device_final_params(fake_dataset, tmp_path):
    """Same seed, same episode schedule: dp=2 == dp=1 final params.

    SGD (like test_fsdp's parity check) so first-step numerics are not
    sign-of-gradient sensitive under the sharded mean's reduction order.
    """
    from fpsg_tpu.cli.trainNetwork import main as train_main

    base = ["--episodes_per_step", "2", "--SGD"]
    d1 = str(tmp_path / "ck1")
    train_main(_args(fake_dataset, d1, "eq", epochs=1, extra=base))
    d2 = str(tmp_path / "ck2")
    train_main(_args(fake_dataset, d2, "eq", epochs=1,
                     extra=base + ["--dp", "2"]))

    p1 = _ckpt_params(os.path.join(d1, "eq"), 1)
    p2 = _ckpt_params(os.path.join(d2, "eq"), 1)
    l1, l2 = jax.tree.leaves(p1["params"]), jax.tree.leaves(p2["params"])
    assert len(l1) == len(l2) and len(l1) > 0
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_train_cli_fsdp_sharded_checkpoint_resume(fake_dataset, tmp_path):
    from fpsg_tpu.cli.trainNetwork import main as train_main

    ckpt_dir = str(tmp_path / "fsdp")
    extra = ["--dp", "2", "--episodes_per_step", "2", "--fsdp"]
    train_main(_args(fake_dataset, ckpt_dir, "fs", extra=extra))
    run_dir = os.path.join(ckpt_dir, "fs")
    assert "(FSDP state sharding)" in _log_text(run_dir)
    # sharded Orbax save: a directory checkpoint, restorable raw
    ck = os.path.join(run_dir, "model_epoch_2")
    assert os.path.isdir(ck)
    raw = _ckpt_params(run_dir, 2)
    assert "params" in raw and "opt_state" in raw

    # resume exercises restore_checkpoint(shardings=...) streaming each
    # leaf into its dp-shard placement
    train_main(_args(fake_dataset, ckpt_dir, "fs", epochs=3,
                     extra=extra + ["--resume", "2"]))
    assert any(f.startswith("model_epoch_3") for f in os.listdir(run_dir))


def test_dp_validation_errors(fake_dataset, tmp_path):
    from fpsg_tpu.cli.trainNetwork import main as train_main

    with pytest.raises(ValueError, match="multiple of dp"):
        train_main(_args(fake_dataset, str(tmp_path / "e1"), "e1",
                         extra=["--dp", "2"]))  # episodes_per_step=1
    with pytest.raises(ValueError, match="host_corpus"):
        train_main(_args(
            fake_dataset, str(tmp_path / "e2"), "e2",
            extra=["--dp", "2", "--episodes_per_step", "2",
                   "--host_corpus"],
        ))
    with pytest.raises(ValueError, match="fsdp requires dp"):
        train_main(_args(fake_dataset, str(tmp_path / "e3"), "e3",
                         extra=["--fsdp"]))
