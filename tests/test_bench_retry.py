"""bench.py transient-failure armor.

The driver runs bench.py exactly once per round; the axon tunnel can
throw spurious backend errors for a few minutes after a restart — and
(2026-08-20) enter hours-long degraded phases that poison a process's
backend after its first failure (CLAUDE.md platform quirks). The armor
is therefore two-level: a fresh WORKER SUBPROCESS per outer attempt
(a poisoned backend cannot be recovered in-process) plus a short
in-worker retry for seconds-scale bursts. Test both levels like
product code.
"""

import json
import subprocess
import types

import pytest

import bench


def _run_inner(monkeypatch, capsys, measure):
    """Drive the WORKER path (--inner): in-process retry over
    measure_ours, JSON on stdout."""
    monkeypatch.setattr(bench, "measure_ours", measure)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        "__graft_entry__._count_devices_with_timeout", lambda t: 1)
    monkeypatch.setattr("sys.argv", ["bench.py", "--inner"])
    bench.main()
    return capsys.readouterr()


def test_inner_retry_recovers_from_one_transient(monkeypatch, capsys):
    calls = []

    def flaky(*a, **kw):
        calls.append(1)
        if len(calls) < 2:
            raise RuntimeError("INVALID_ARGUMENT: TPU backend error")
        return 18.5

    out = _run_inner(monkeypatch, capsys, flaky)
    assert len(calls) == 2
    line = [l for l in out.out.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    assert data["value"] == 18.5
    assert data["metric"].startswith("episodes_per_sec")
    # failures were reported on stderr, not stdout (the driver parses
    # stdout as the artifact)
    assert "failed" in out.err
    assert "failed" not in out.out


def test_inner_persistent_failure_reraises(monkeypatch, capsys):
    calls = []

    def dead(*a, **kw):
        calls.append(1)
        raise RuntimeError("INVALID_ARGUMENT: TPU backend error")

    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        _run_inner(monkeypatch, capsys, dead)
    assert len(calls) == 2  # bounded — no infinite retry


def test_json_line_is_clean_stdout(monkeypatch, capsys):
    out = _run_inner(monkeypatch, capsys, lambda *a, **kw: 18.692)
    lines = [l for l in out.out.splitlines() if l.strip()]
    assert len(lines) == 1  # exactly one machine-readable line
    data = json.loads(lines[0])
    assert data["unit"] == "episodes/s"
    assert 0 < data["mfu"] < 1
    assert data["vs_baseline"] == round(18.692 / 6.7, 2)


def _run_outer(monkeypatch, capsys, runs, probe_devices=1):
    """Drive the OUTER path with subprocess.run mocked: `runs` is a list
    of (returncode, stdout) per worker attempt."""
    calls = []

    def fake_run(cmd, **kw):
        assert "--inner" in cmd  # outer only ever spawns workers
        rc, out = runs[min(len(calls), len(runs) - 1)]
        calls.append(cmd)
        return types.SimpleNamespace(returncode=rc, stdout=out,
                                     stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        "__graft_entry__._count_devices_with_timeout",
        lambda t: probe_devices)
    monkeypatch.setattr("sys.argv", ["bench.py"])
    code = None
    try:
        bench.main()
    except SystemExit as e:
        code = e.code
    return capsys.readouterr(), calls, code


def test_outer_fresh_worker_recovers(monkeypatch, capsys):
    """A poisoned first worker (exit 1) is replaced by a fresh one
    whose JSON line is forwarded verbatim on stdout."""
    good = json.dumps({"metric": "episodes_per_sec_x", "value": 18.5})
    out, calls, code = _run_outer(
        monkeypatch, capsys, [(1, ""), (0, good + "\n")])
    assert code is None
    assert len(calls) == 2
    line = [l for l in out.out.splitlines() if l.startswith("{")][-1]
    assert json.loads(line)["value"] == 18.5
    assert "worker attempt 1/4 failed" in out.err


def test_outer_bounded_attempts_and_exit_code(monkeypatch, capsys):
    out, calls, code = _run_outer(monkeypatch, capsys, [(1, "")] * 10)
    assert len(calls) == 4  # bounded
    assert code == 1


def test_outer_timeout_gets_cooldown_and_forwards_stderr(monkeypatch,
                                                         capsys):
    """A hung worker (TimeoutExpired) is the strongest degraded-tunnel
    signal: it must take the same cool-down path as other failures and
    its partial stderr must be forwarded, not discarded (ADVICE r4)."""
    calls, sleeps = [], []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        if len(calls) == 1:
            raise subprocess.TimeoutExpired(
                cmd, 3600, stderr=b"partial worker stderr\n")
        good = json.dumps({"metric": "episodes_per_sec_x", "value": 18.5})
        return types.SimpleNamespace(returncode=0, stdout=good + "\n",
                                     stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    monkeypatch.setattr(
        "__graft_entry__._count_devices_with_timeout", lambda t: 1)
    monkeypatch.setattr("sys.argv", ["bench.py"])
    bench.main()
    out = capsys.readouterr()
    assert len(calls) == 2
    assert sleeps, "timeout path must cool down before the next worker"
    assert "partial worker stderr" in out.err
    assert "hung" in out.err
    assert json.loads(out.out.splitlines()[-1])["value"] == 18.5


def test_outer_tunnel_down_exits_2_without_workers(monkeypatch, capsys):
    out, calls, code = _run_outer(monkeypatch, capsys,
                                  [(0, "{}")], probe_devices=0)
    assert calls == []  # never spawned a worker
    assert code == 2
