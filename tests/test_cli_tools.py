"""Offline tooling CLIs: train_test_split, view_generator sampling, and the
flag-surface snapshot against reference defaults."""

import argparse
import os

import numpy as np

from fpsg_tpu.config import FPSGConfig, add_train_flags, config_from_args


def test_split_mode(tmp_path):
    from fpsg_tpu.cli.train_test_split import main as split_main

    for cat in ["chairs", "tables"]:
        d = tmp_path / cat
        d.mkdir()
        for i in range(10):
            (d / f"item{i:02d}").write_text("x")
    split_main(["--mode", "split", "--root", str(tmp_path), "--seed", "0"])
    train = (tmp_path / "chairs_train.txt").read_text().splitlines()
    test = (tmp_path / "chairs_test.txt").read_text().splitlines()
    assert len(train) == 8 and len(test) == 2
    assert not set(train) & set(test)


def test_mv_npy_mode(tmp_path):
    from fpsg_tpu.cli.train_test_split import main as split_main

    item_root = tmp_path / "items"
    (item_root / "itemA" / "models").mkdir(parents=True)
    npy_root = tmp_path / "npys"
    npy_root.mkdir()
    np.save(npy_root / "itemA.npy", np.zeros((4, 3), np.float32))
    split_main(["--mode", "mv_npy", "--root", str(item_root),
                "--npy_root", str(npy_root)])
    assert (item_root / "itemA" / "models" / "npy_file.npy").exists()
    assert not (npy_root / "itemA.npy").exists()


def test_view_generator_sampling(tmp_path):
    from fpsg_tpu.cli.view_generator import main as vg_main
    from fpsg_tpu.data.readers import read_ply

    mesh_root = tmp_path / "meshes"
    mesh_root.mkdir()
    (mesh_root / "tet.off").write_text(
        "OFF\n4 2 0\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n3 0 1 2\n3 0 1 3\n")
    out = tmp_path / "pc"
    vg_main(["--mesh_root", str(mesh_root), "--pc_out", str(out),
             "--n_points", "128", "--off2ply_out", str(tmp_path / "v")])
    pts = read_ply(str(out / "tet.ply"), 128)
    assert pts.shape == (128, 3)
    verts = read_ply(str(tmp_path / "v" / "tet.ply"), 10)
    assert verts.shape == (4, 3)


def test_flag_surface_defaults_match_reference():
    """Snapshot: every reference trainNetwork flag parses with the
    reference's default (SURVEY.md §5 config surface)."""
    parser = argparse.ArgumentParser()
    add_train_flags(parser)
    args = parser.parse_args(["--config_path", "a", "--test_path", "b"])
    conf = config_from_args(args)
    ref_defaults = {
        "refer_path": "./modelnet_files/", "dataset": "modelnet",
        "n_way": 1, "n_shot": 20, "n_query": 0,
        "img_encoder": "vgg_16", "pc_encoder": "pointnet",
        "support_factor": 1.0, "query_factor": 1.0, "intra_recon": False,
        "epoch_start_recon": 0, "num_clusters": 4, "ori_dim": 2,
        "raw_dim": 3, "num_nodes": 4, "bottleneck_size": 1536,
        "template_type": "SQUARE", "activation": "relu", "dim_template": 2,
        "aggregate": "single", "n_episode": 100, "epoch": 500, "lr": 1e-3,
        "lr_decay": 350, "resume": -1, "pc_dist": "cd", "SGD": False,
        "name": "0", "dir_name": "", "model_path": "../checkpoint",
        "save_interval": 50, "sample_interval": 10, "eval_interval": 20,
        "eval_model": "NONE", "sequential_eval": False,
    }
    for flag, want in ref_defaults.items():
        assert getattr(conf, flag) == want, (flag, getattr(conf, flag), want)
    # n_query == 0 resolves to n_shot, like trainNetwork.py:71
    assert conf.effective_n_query == conf.n_shot


# ---------------------------------------------------------------------------
# phong.py pure helpers (no Blender needed): camera rig, naming, compositor
# ---------------------------------------------------------------------------

def test_phong_camera_rig_matches_reference():
    """12 cameras, r=3, theta=60deg polar, 30-deg azimuth steps
    (reference src/phong.py:24,171-182)."""
    import math

    from fpsg_tpu.cli.phong import CAMERAS, CAMERA_R, camera_location

    assert CAMERAS == [(60, phi) for phi in range(0, 360, 30)]
    assert CAMERA_R == 3.0
    # reference formula: x = r sin(t) cos(p), y = r sin(t) sin(p), z = r cos(t)
    for theta, phi in CAMERAS:
        x, y, z = camera_location(theta, phi)
        t, p = math.radians(theta), math.radians(phi)
        assert abs(x - 3.0 * math.sin(t) * math.cos(p)) < 1e-12
        assert abs(y - 3.0 * math.sin(t) * math.sin(p)) < 1e-12
        assert abs(z - 3.0 * math.cos(t)) < 1e-12
    # all views share z = 1.5 (60-deg polar at r=3)
    assert abs(camera_location(60, 123)[2] - 1.5) < 1e-12


def test_phong_output_naming_matches_reference():
    """``<name>.<i>.png`` incl. the stl title-case quirk (phong.py:110-128)."""
    from fpsg_tpu.cli.phong import model_name_from_path, output_name

    assert output_name("airplane_0001", 7) == "airplane_0001.7.png"
    assert model_name_from_path("/data/m/airplane_0001.off") == "airplane_0001"
    assert model_name_from_path("/data/m/night_stand.stl") == "Night Stand"


def test_phong_compositor_graph_is_reference_alpha_over():
    """background image -> scale(RENDER_SIZE) -> alpha-over(render layer)
    -> output (phong.py:194-218)."""
    from fpsg_tpu.cli.phong import compositor_graph

    edges = compositor_graph()
    assert ("image", 0, "scale", 0) in edges
    assert ("scale", 0, "alpha_over", 1) in edges          # background below
    assert ("render_layer", 0, "alpha_over", 2) in edges   # render on top
    assert ("alpha_over", 0, "output", 0) in edges
    assert len(edges) == 4
