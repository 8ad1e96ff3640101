"""Loop-level transient-failure resume (train/loop.py).

An axon tunnel flake poisons BOTH the donated input state and the step's
output (CLAUDE.md platform quirks), so recovery replays the epoch from a
host-side snapshot of (state, rng key). These tests verify the replay is
EXACT — the recovered run ends bit-identical to an uninterrupted one —
and that the bounded attempt budget still falls back to the emergency
checkpoint when the failure is persistent.
"""

import glob
import os

import numpy as np
import pytest

from fpsg_tpu.config import FPSGConfig
from fpsg_tpu.data import generate_modelnet_manifests, materialize_fake_modelnet


def _tiny_conf(tmp_path, name, **overrides):
    root = str(tmp_path / f"data_{name}")
    img_root, pc_root = materialize_fake_modelnet(
        root, classes=["cube"], items_per_class=4,
        n_pts=64, img_size=64,
    )
    out = str(tmp_path / f"m_{name}") + "/"
    generate_modelnet_manifests(img_root, pc_root, out,
                                train_classes=["cube"], test_classes=[])
    kw = dict(
        config_path=out + "modelnet_train.txt",
        test_path=out + "modelnet_train.txt",
        refer_path=out + "modelnet_files/",
        img_encoder="tiny", n_shot=2, n_query=1, num_pts=64,
        n_episode=2, epoch=3, eval_interval=10, save_interval=10,
        sample_interval=10, name=name, model_path=str(tmp_path / "ck"),
        steps_per_call=1,
    )
    kw.update(overrides)
    return FPSGConfig(**kw)


def _final_params(state):
    import jax

    return jax.device_get(state.params)


def _inject_failures(monkeypatch, loop_mod, fail_calls):
    """Wrap make_train_step so dispatches whose 1-based global call index
    is in ``fail_calls`` raise once (each index fires at most once)."""
    real_make = loop_mod.make_train_step
    remaining = set(fail_calls)
    calls = {"n": 0}

    def flaky_make(*args, **kwargs):
        step = real_make(*args, **kwargs)

        def wrapped(state, corpus, key):
            calls["n"] += 1
            if calls["n"] in remaining:
                remaining.discard(calls["n"])
                raise RuntimeError(f"injected transient #{calls['n']}")
            return step(state, corpus, key)

        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", flaky_make)
    return calls


def test_replay_matches_uninterrupted_run(tmp_path, monkeypatch):
    import fpsg_tpu.train.loop as loop_mod

    ref_state = loop_mod.train_network(
        _tiny_conf(tmp_path, "ref", transient_retries=0))
    ref = _final_params(ref_state)

    # die once inside epoch 2 (2 dispatches/epoch): the loop must replay
    # epoch 2 from its entry snapshot and land on the same trajectory
    _inject_failures(monkeypatch, loop_mod, fail_calls={4})
    conf = _tiny_conf(tmp_path, "flaky", transient_retries=2)
    state = loop_mod.train_network(conf)

    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref, _final_params(state),
    )
    # the recovery left a trace in the run log
    run_dir = os.path.join(conf.model_path, conf.name)
    logs = "".join(open(f).read() for f in glob.glob(f"{run_dir}/log_*.txt"))
    assert "Transient failure in epoch 2" in logs


def test_multi_epoch_replay_from_old_snapshot(tmp_path, monkeypatch):
    """snapshot_interval > 1: the failure replays several epochs from the
    last snapshot, still landing bit-identical (keys rewind with it)."""
    import fpsg_tpu.train.loop as loop_mod

    ref_state = loop_mod.train_network(
        _tiny_conf(tmp_path, "ref2", transient_retries=0))
    ref = _final_params(ref_state)

    _inject_failures(monkeypatch, loop_mod, fail_calls={6})  # epoch 3
    conf = _tiny_conf(
        tmp_path, "flaky2", transient_retries=1, snapshot_interval=10,
    )  # only the epoch-1 snapshot exists → replays epochs 1-3
    state = loop_mod.train_network(conf)

    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref, _final_params(state),
    )


def test_two_flakes_in_one_window_within_budget(tmp_path, monkeypatch):
    import fpsg_tpu.train.loop as loop_mod

    ref_state = loop_mod.train_network(
        _tiny_conf(tmp_path, "ref3", transient_retries=0))
    ref = _final_params(ref_state)

    # two transients inside epoch 2's window: the first at global call 4,
    # the second during the replay (call 6 = epoch-2 replay, 2nd dispatch)
    _inject_failures(monkeypatch, loop_mod, fail_calls={4, 6})
    conf = _tiny_conf(tmp_path, "flaky3", transient_retries=2)
    state = loop_mod.train_network(conf)

    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref, _final_params(state),
    )


def test_persistent_failure_exhausts_budget_and_saves(tmp_path, monkeypatch):
    import fpsg_tpu.train.loop as loop_mod

    real_make = loop_mod.make_train_step
    calls = {"n": 0}

    def flaky_make(*args, **kwargs):
        step = real_make(*args, **kwargs)

        def wrapped(state, corpus, key):
            calls["n"] += 1
            if calls["n"] >= 4:  # every dispatch from epoch 2 on fails
                raise RuntimeError("persistent failure")
            return step(state, corpus, key)

        return wrapped

    monkeypatch.setattr(loop_mod, "make_train_step", flaky_make)
    conf = _tiny_conf(tmp_path, "dead", transient_retries=2)
    with pytest.raises(RuntimeError, match="persistent failure"):
        loop_mod.train_network(conf)
    # epoch 1 = calls 1-2; epoch 2 fails at call 4, then each of the two
    # replays fails at its first dispatch (calls 5 and 6) → budget spent
    assert calls["n"] == 6

    run_dir = os.path.join(conf.model_path, conf.name)
    saved = [f for f in os.listdir(run_dir) if f.startswith("model_epoch_")]
    assert saved, os.listdir(run_dir)


def test_retry_readonly_unit():
    from fpsg_tpu.train.retry import retry_readonly

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("flake")
        return 42

    assert retry_readonly(flaky, retries=2) == 42
    assert calls["n"] == 3

    def dead():
        raise RuntimeError("persistent")

    with pytest.raises(RuntimeError, match="persistent"):
        retry_readonly(dead, retries=1)

    def interrupted():
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):  # never swallowed/retried
        retry_readonly(interrupted, retries=5)


def test_pretrain_retry_replays_exactly(tmp_path, monkeypatch):
    """The pretraining driver rewinds BOTH rng streams (jax key + numpy
    permutation generator) with the snapshot — recovered == uninterrupted."""
    import fpsg_tpu.train.pretrain as pre_mod
    from fpsg_tpu.train.pretrain import PretrainConfig, pretrain_pc_encoder

    def conf(name, **kw):
        return PretrainConfig(
            dataset="synthetic", core="pointnet", epoch=3, batch_size=8,
            n_pts=64, val_interval=10, save_interval=10, name=name,
            model_path=str(tmp_path / "ck"), **kw,
        )

    ref_state, _ = pretrain_pc_encoder(conf("ref", transient_retries=0))
    ref = _final_params(ref_state)

    real_make = pre_mod.make_pretrain_step
    calls = {"n": 0}

    def flaky_make(*args, **kwargs):
        step = real_make(*args, **kwargs)

        def wrapped(state, pcs, labels, key):
            calls["n"] += 1
            if calls["n"] == 5:
                raise RuntimeError("injected transient")
            return step(state, pcs, labels, key)

        return wrapped

    monkeypatch.setattr(pre_mod, "make_pretrain_step", flaky_make)
    state, _ = pretrain_pc_encoder(conf("flaky", transient_retries=1))

    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref, _final_params(state),
    )


def test_dp_mesh_retry_restores_sharded_state(tmp_path, monkeypatch):
    """The restore path under --dp re-uploads and re-shards: the recovered
    dp=2 run matches an uninterrupted dp=2 run exactly."""
    import fpsg_tpu.train.loop as loop_mod

    common = dict(episodes_per_step=2, dp=2)
    ref_state = loop_mod.train_network(
        _tiny_conf(tmp_path, "refdp", transient_retries=0, **common))
    ref = _final_params(ref_state)

    _inject_failures(monkeypatch, loop_mod, fail_calls={2})  # epoch 2
    conf = _tiny_conf(tmp_path, "flakydp", transient_retries=1, **common)
    state = loop_mod.train_network(conf)

    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref, _final_params(state),
    )


def test_deterministic_errors_fail_fast():
    """Structural (flax) errors can never be fixed by a replay — the
    classifier routes them to fail-fast; backend transients (including
    the axon layout-poison ValueError, CLAUDE.md) stay retryable."""
    from flax.errors import ScopeParamNotFoundError

    from fpsg_tpu.train.retry import is_deterministic_error

    assert is_deterministic_error(
        ScopeParamNotFoundError("kernel", "/x"))
    assert not is_deterministic_error(
        ValueError("Layout passed to jit does not match"))
    assert not is_deterministic_error(RuntimeError("INVALID_ARGUMENT"))
