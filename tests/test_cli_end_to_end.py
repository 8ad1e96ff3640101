"""Integration: full CLI pipeline on the materialized synthetic dataset.

materialize fake ModelNet tree → generate_dataset manifests → trainNetwork
(2 epochs, tiny image encoder) → checkpoint/log artifacts → resume →
evaluate_Network per-class CD/EMD.
"""

import os

import numpy as np
import pytest

from fpsg_tpu.data import generate_modelnet_manifests, materialize_fake_modelnet


@pytest.fixture(scope="module")
def fake_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_modelnet")
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


def _train_args(out, ckpt_dir, epochs=2):
    return [
        "--config_path", out + "modelnet_train.txt",
        "--test_path", out + "modelnet_test.txt",
        "--refer_path", out + "modelnet_files/",
        "--pc_encoder_path", "NONE",
        "--img_encoder", "tiny",
        "--n_shot", "3", "--n_query", "1",
        "--num_pts", "128",
        "--n_episode", "4",
        "--epoch", str(epochs),
        "--eval_interval", "2",
        "--save_interval", "2",
        "--sample_interval", "2",
        "--eval_episodes", "4",
        "--name", "cli_test",
        "--model_path", ckpt_dir,
    ]


def test_train_cli_end_to_end(fake_dataset, tmp_path):
    from fpsg_tpu.cli.trainNetwork import main as train_main

    ckpt_dir = str(tmp_path / "ckpt")
    train_main(_train_args(fake_dataset, ckpt_dir))

    run_dir = os.path.join(ckpt_dir, "cli_test")
    assert os.path.isdir(run_dir)
    # checkpoint with reference naming
    ckpts = [f for f in os.listdir(run_dir) if f.startswith("model_epoch_2")]
    assert ckpts, os.listdir(run_dir)
    # buffered log file flushed
    logs = [f for f in os.listdir(run_dir) if f.startswith("log_")]
    assert logs
    log_text = open(os.path.join(run_dir, logs[0])).read()
    assert "Training Results for Epoch -- 1" in log_text
    assert "Class: cylinder" in log_text  # per-class eval on novel class
    # qualitative sample artifacts
    imgs = os.listdir(os.path.join(run_dir, "images"))
    assert any(f.endswith(".png") for f in imgs)
    assert any(f.endswith(".npy") for f in imgs)

    # resume from the saved checkpoint, one extra epoch
    from fpsg_tpu.cli.trainNetwork import main as train_main2

    train_main2(
        _train_args(fake_dataset, ckpt_dir, epochs=3) + ["--resume", "2"]
    )
    assert any(
        f.startswith("model_epoch_3") for f in os.listdir(run_dir)
    )

    # evaluation CLI on the trained model, with reconstruction dumps
    from fpsg_tpu.cli.evaluate_Network import main as eval_main

    npy_dir = os.path.join(ckpt_dir, "npy_out")
    eval_main(
        _train_args(fake_dataset, ckpt_dir)
        + ["--eval_model", "model_epoch_2", "--sequential_eval",
           "--dump_reconstructions", "--npy_folder", npy_dir]
    )
    dumped = os.listdir(npy_dir)
    assert any(f.endswith(".png") for f in dumped)
    assert any(f.endswith("_gt.npy") for f in dumped)


DGCNN_CKPT = ("/root/reference/checkpoint/pretrain_dgcnn/"
              "pretrained_pcencoder_dgcnn.pt")


def _make_legacy_dgcnn_ckpt(path):
    """A reference-layout dgcnn pc-encoder state dict (Sequential
    conv{i}.{0,1}, Conv2d(k=1) bias-free — src/dgcnn/model.py:53-57),
    saved with torch.save like the reference's pretrainer would."""
    import torch

    g = torch.Generator().manual_seed(0)
    sd = {}
    for name, cin, cout, conv1d in [
        ("conv1", 6, 64, False), ("conv2", 128, 64, False),
        ("conv3", 128, 128, False), ("conv4", 256, 256, False),
        ("conv5", 512, 512, True),
    ]:
        wshape = (cout, cin, 1) if conv1d else (cout, cin, 1, 1)
        sd[f"pc_encoder.{name}.0.weight"] = torch.randn(
            wshape, generator=g) * 0.1
        sd[f"pc_encoder.{name}.1.weight"] = torch.rand(
            (cout,), generator=g) + 0.5
        sd[f"pc_encoder.{name}.1.bias"] = torch.randn(
            (cout,), generator=g) * 0.1
        sd[f"pc_encoder.{name}.1.running_mean"] = torch.randn(
            (cout,), generator=g) * 0.1
        sd[f"pc_encoder.{name}.1.running_var"] = torch.rand(
            (cout,), generator=g) + 0.5
        sd[f"pc_encoder.{name}.1.num_batches_tracked"] = torch.tensor(7)
    torch.save(sd, path)
    return sd


def test_train_cli_dgcnn_backbone(fake_dataset, tmp_path):
    """--pc_encoder dgcnn end-to-end (reference trainNetwork.py:226):
    a reference-layout legacy dgcnn checkpoint ingests into the trainer
    (trainNetwork.py:57-60), trains, checkpoints, and the grafted
    weights are bitwise the converted ones."""
    from fpsg_tpu.cli.trainNetwork import main as train_main

    legacy = str(tmp_path / "legacy_dgcnn.pt")
    sd = _make_legacy_dgcnn_ckpt(legacy)

    ckpt_dir = str(tmp_path / "ckpt_dgcnn")
    args = _train_args(fake_dataset, ckpt_dir, epochs=1)
    args[args.index("--pc_encoder_path") + 1] = legacy
    train_main(args + ["--pc_encoder", "dgcnn", "--n_episode", "2",
                       "--eval_interval", "1", "--eval_episodes", "2"])
    run_dir = os.path.join(ckpt_dir, "cli_test")
    assert any(f.startswith("model_epoch_1") for f in os.listdir(run_dir))
    logs = [f for f in os.listdir(run_dir) if f.startswith("log_")]
    text = open(os.path.join(run_dir, logs[0])).read()
    assert "Training Results for Epoch -- 1" in text

    # the graft really took: fresh state holds the converted weights
    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.train.loop import build_model, make_state
    from fpsg_tpu.train.optim import make_optimizer

    conf = FPSGConfig(
        img_encoder="tiny", pc_encoder="dgcnn",
        pc_encoder_path=legacy, num_pts=128, n_shot=3, n_query=1,
    )
    state = make_state(build_model(conf), conf, make_optimizer(),
                       img_size=16)
    enc = state.params["pc_encoder_wrap"]["pc_encoder"]
    np.testing.assert_array_equal(
        np.asarray(enc["conv1"]["conv"]["kernel"]),
        sd["pc_encoder.conv1.0.weight"].numpy()[:, :, 0, 0].T)
    np.testing.assert_array_equal(
        np.asarray(enc["conv5"]["kernel"]),
        sd["pc_encoder.conv5.0.weight"].numpy()[:, :, 0].T)
    stats = state.batch_stats["pc_encoder_wrap"]["pc_encoder"]
    np.testing.assert_array_equal(
        np.asarray(stats["conv3"]["bn"]["var"]),
        sd["pc_encoder.conv3.1.running_var"].numpy())


@pytest.mark.skipif(not os.path.exists(DGCNN_CKPT),
                    reason="shipped dgcnn checkpoint not present")
def test_shipped_dgcnn_checkpoint_mismatch_is_diagnosed():
    """The reference repo ships a POINTNET state dict under
    pretrain_dgcnn/pretrained_pcencoder_dgcnn.pt (packaging bug — the
    reference's own strict load_state_dict would crash on it). Loading
    it as dgcnn must fail with a diagnosis, not a flax shape error;
    loading it as pointnet works (it IS a pointnet encoder)."""
    from fpsg_tpu.io.convert import load_pretrained_pc_encoder

    with pytest.raises(ValueError, match="pointnet state dict"):
        load_pretrained_pc_encoder(DGCNN_CKPT, "dgcnn")
    loaded = load_pretrained_pc_encoder(DGCNN_CKPT, "pointnet")
    assert "pointnet_feat_extractor" in loaded["params"]["pc_encoder"]


def test_random_init_vgg_warns_loudly(capsys):
    """No --img_encoder_path with a vgg branch → loud stderr warning
    naming the fetch recipe (the reference always trains from ImageNet
    weights; silently random-initializing would diverge silently)."""
    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.train.loop import load_pretrained_weights

    conf = FPSGConfig(img_encoder="vgg_16")
    load_pretrained_weights({"params": {}, "batch_stats": {}}, conf)
    err = capsys.readouterr().err
    assert "RANDOM init" in err and "fetch_vgg16" in err

    # tiny encoder (test-only backbone): no warning
    conf = FPSGConfig(img_encoder="tiny")
    load_pretrained_weights({"params": {}, "batch_stats": {}}, conf)
    assert "RANDOM init" not in capsys.readouterr().err


def test_pretrain_cli(tmp_path):
    from fpsg_tpu.cli.trainPointAE import main as pretrain_main

    ckpt_dir = str(tmp_path / "pre")
    pretrain_main([
        "--root", "unused", "--dataset", "synthetic",
        "--epoch", "2", "--batch_size", "8",
        "--val_interval", "1", "--save_interval", "2",
        "--name", "pre_test", "--model_path", ckpt_dir,
    ])
    run_dir = os.path.join(ckpt_dir, "pre_test")
    saved = [f for f in os.listdir(run_dir)
             if f.startswith("pre_test_pointnet")]
    assert saved, os.listdir(run_dir)


def test_pretrained_encoder_flows_into_trainer(fake_dataset, tmp_path):
    """The pretrainer's native checkpoint loads into trainNetwork."""
    from fpsg_tpu.train.pretrain import PretrainConfig, pretrain_pc_encoder
    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.train.loop import build_model, make_state
    from fpsg_tpu.train.optim import make_optimizer

    conf = PretrainConfig(
        dataset="synthetic", epoch=1, batch_size=8, n_pts=128,
        name="pre_flow", model_path=str(tmp_path),
    )
    state, enc_path = pretrain_pc_encoder(conf)

    tconf = FPSGConfig(
        img_encoder="tiny", pc_encoder_path=enc_path, num_pts=128,
        n_shot=3, n_query=1,
    )
    model = build_model(tconf)
    tstate = make_state(model, tconf, make_optimizer(), img_size=16)
    # encoder weights must equal the pretrained ones
    import jax

    pre = state.params["encoder"]
    post = tstate.params["pc_encoder_wrap"]
    for a, b in zip(jax.tree.leaves(pre), jax.tree.leaves(post)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluate_random_sampler_api(fake_dataset, tmp_path):
    """Non-sequential (EpisodicBatchSampler-style) eval path with EMD."""
    from fpsg_tpu.config import FPSGConfig
    from fpsg_tpu.train.loop import evaluate_network

    conf = FPSGConfig(
        config_path=fake_dataset + "modelnet_train.txt",
        test_path=fake_dataset + "modelnet_test.txt",
        refer_path=fake_dataset + "modelnet_files/",
        img_encoder="tiny",
        n_shot=3, n_query=1, num_pts=128,
        eval_episodes=6,
        model_path=str(tmp_path), name="na",
    )
    results = evaluate_network(conf)
    assert results, "no per-class results"
    for name, vals in results.items():
        assert np.isfinite(vals["cd"]) and np.isfinite(vals["emd"])


def test_generate_cli(fake_dataset, tmp_path):
    """Single-image inference CLI: image + support plys -> npy cloud."""
    from fpsg_tpu.cli.generate import main as gen_main

    # grab a query image + support plys from the fixture tree
    with open(fake_dataset + "modelnet_files/modelnet+cube.txt") as f:
        rows = [ln.strip().split("\t") for ln in f if ln.strip()]
    img = rows[0][0]
    support_dir = os.path.dirname(rows[0][1])

    out = str(tmp_path / "cloud.npy")
    gen_main([
        "--config_path", "NA", "--test_path", "NA",
        "--img_encoder", "tiny", "--num_pts", "128",
        "--image", img, "--support_dir", support_dir, "--out", out,
    ])
    cloud = np.load(out)
    assert cloud.shape == (128, 3)
    assert np.isfinite(cloud).all()


def test_train_cli_host_corpus(fake_dataset, tmp_path):
    """--host_corpus: host-RAM corpus + prefetch-thread episode assembly."""
    from fpsg_tpu.cli.trainNetwork import main as train_main

    ckpt_dir = str(tmp_path / "ckpt_host")
    train_main(_train_args(fake_dataset, ckpt_dir) + ["--host_corpus"])
    run_dir = os.path.join(ckpt_dir, "cli_test")
    logs = [f for f in os.listdir(run_dir) if f.startswith("log_")]
    text = open(os.path.join(run_dir, logs[0])).read()
    assert "Training Results for Epoch -- 2" in text


def test_profile_dir_writes_trace(fake_dataset, tmp_path):
    from fpsg_tpu.cli.trainNetwork import main as train_main

    prof = str(tmp_path / "trace")
    train_main(
        _train_args(fake_dataset, str(tmp_path / "ck"), epochs=1)
        + ["--n_episode", "2", "--profile_dir", prof]
    )
    import glob

    assert glob.glob(prof + "/**/*.trace.json.gz", recursive=True) or \
        glob.glob(prof + "/**/*.xplane.pb", recursive=True), \
        "no profiler trace written"
