"""bench.py outage behavior (VERDICT r3 weak #1): a persistent tunnel
failure must produce a STRUCTURED one-line JSON error (driver-parseable,
distinguishable from a perf regression) after spaced retries — not a bare
traceback."""

import json
import sys


def _run_main_with_failure(monkeypatch, capsys, msg):
    sys.path.insert(0, "/root/repo")
    import bench

    calls = {"n": 0}

    def boom():
        calls["n"] += 1
        raise RuntimeError(msg)

    monkeypatch.setattr(bench, "_build_and_time", boom)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    try:
        bench.main()
    except SystemExit as e:
        rc = e.code
    else:
        rc = 0
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    return rc, calls["n"], json.loads(line)


def test_unavailable_emits_structured_error(monkeypatch, capsys):
    rc, attempts, rec = _run_main_with_failure(
        monkeypatch, capsys, "UNAVAILABLE: failed to connect to axon")
    assert rc == 1
    assert attempts == 3                      # spaced retries all consumed
    assert rec["error"] == "tpu_unavailable"
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["metric"] == "cfg_sampling_throughput_len96"
    assert "UNAVAILABLE" in rec["detail"]


def test_other_failures_are_not_mislabelled(monkeypatch, capsys):
    rc, attempts, rec = _run_main_with_failure(
        monkeypatch, capsys, "VMEM exceeded while compiling")
    assert rc == 1 and attempts == 3
    assert rec["error"] == "bench_failed"
