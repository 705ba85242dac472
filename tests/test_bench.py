"""bench.py is the driver's one-shot benchmark entry — a smoke test keeps
its route-competition plumbing (flat bitonic / multiclass BlockCSR / ESC)
and JSON contract from drifting between the rare real-TPU runs."""

import json
import os
import sys

import numpy as np


def test_bench_smoke_json_contract(capsys, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    monkeypatch.setenv("IA_SPGEMM_BENCH_SMOKE", "1")
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    r = json.loads(line)
    assert r["metric"] == "spgemm_gflops"
    assert r["unit"] == "GFLOPS"
    assert r["value"] > 0 and r["vs_baseline"] > 0
    d = r["detail"]
    # all three routes must have been measured in smoke mode
    assert set(d["routes"]) >= {"esc"}
    assert d["algorithm"] in d["routes"]
    assert d["checksum_rel_err"] < 1e-4
    assert d["ours_ms"] > 0 and d["nnz_out"] > 0
    assert d["roofline"]["pct_of_sol"] >= 0


def test_bench_supervisor_emits_json_on_tpu_failure(capsys, monkeypatch):
    """A dead/wedged tunnel must produce ONE parseable JSON line and rc=1,
    not a traceback (the BENCH_r02.json failure mode)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    monkeypatch.setenv("IA_SPGEMM_BENCH_WAIT_S", "1")
    monkeypatch.setattr(bench, "_probe_tpu",
                        lambda timeout_s: (False, "synthetic: relay down"))
    rc = bench.supervise()
    assert rc == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    r = json.loads(line)
    assert r["metric"] == "spgemm_gflops" and r["value"] == 0.0
    assert "synthetic: relay down" in r["error"]


def test_bench_supervisor_forwards_worker_json(capsys, monkeypatch):
    """When the probe passes, the supervisor must forward the worker's last
    stdout line verbatim and return 0."""
    import types

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    payload = json.dumps({"metric": "spgemm_gflops", "value": 1.0,
                          "unit": "GFLOPS", "vs_baseline": 2.0})
    monkeypatch.setattr(bench, "_probe_tpu",
                        lambda timeout_s: (True, "ok"))
    monkeypatch.setattr(
        bench.subprocess, "run",
        lambda *a, **k: types.SimpleNamespace(
            returncode=0, stdout="compile log noise\n" + payload + "\n",
            stderr=""))
    rc = bench.supervise()
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["vs_baseline"] == 2.0
