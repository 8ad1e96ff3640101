"""bench.py transient-failure armor.

The driver runs bench.py exactly once per round; the axon tunnel can
throw spurious backend errors for a few minutes after a restart
(CLAUDE.md platform quirks). The retry loop is what stands between a
transient and a failed round artifact — test it like product code.
"""

import json

import pytest

import bench


def _run_main(monkeypatch, capsys, measure):
    monkeypatch.setattr(bench, "measure_ours", measure)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        "__graft_entry__._count_devices_with_timeout", lambda t: 1)
    monkeypatch.setattr("sys.argv", ["bench.py"])
    bench.main()
    return capsys.readouterr()


def test_retry_recovers_from_two_transients(monkeypatch, capsys):
    calls = []

    def flaky(*a, **kw):
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("INVALID_ARGUMENT: TPU backend error")
        return 18.5

    out = _run_main(monkeypatch, capsys, flaky)
    assert len(calls) == 3
    line = [l for l in out.out.splitlines() if l.startswith("{")][-1]
    data = json.loads(line)
    assert data["value"] == 18.5
    assert data["metric"].startswith("episodes_per_sec")
    # failures were reported on stderr, not stdout (the driver parses
    # stdout as the artifact)
    assert "failed" in out.err
    assert "failed" not in out.out


def test_persistent_failure_reraises(monkeypatch, capsys):
    calls = []

    def dead(*a, **kw):
        calls.append(1)
        raise RuntimeError("INVALID_ARGUMENT: TPU backend error")

    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        _run_main(monkeypatch, capsys, dead)
    assert len(calls) == 3  # bounded — no infinite retry


def test_json_line_is_clean_stdout(monkeypatch, capsys):
    out = _run_main(monkeypatch, capsys, lambda *a, **kw: 18.692)
    lines = [l for l in out.out.splitlines() if l.strip()]
    assert len(lines) == 1  # exactly one machine-readable line
    data = json.loads(lines[0])
    assert data["unit"] == "episodes/s"
    assert 0 < data["mfu"] < 1
    assert data["vs_baseline"] == round(18.692 / 6.7, 2)
