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


def test_pick_bench_tuning(tmp_path, monkeypatch):
    """The distiller must ignore sparse-mode and checksum-dirty rows and
    pick the fastest clean compacted route across fused-width artifacts."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import pick_bench_tuning as pbt

    a = tmp_path / "headline_routes_w256.json"
    b = tmp_path / "headline_routes_w512.json"
    a.write_text(json.dumps({"fused_max_width": 256, "results": [
        {"route": "flat", "device_ms": 9.2, "rel_err": 1e-7},
        {"route": "flat_sparse", "device_ms": 5.0, "rel_err": 1e-7},
    ]}))
    b.write_text(json.dumps({"fused_max_width": 512, "results": [
        {"route": "mc_bcsr", "device_ms": 6.1, "rel_err": 1e-7},
        {"route": "flat", "device_ms": 4.0, "rel_err": 2e-3},
    ]}))
    best = pbt.pick([str(a), str(b)])
    assert best["fused_max_width"] == 512 and best["route"] == "mc_bcsr"
    assert pbt.pick([]) is None


def test_bench_applies_tuning_artifact(tmp_path, monkeypatch):
    """bench.main must adopt reports/bench_tuning.json as the fused-width
    env default (before ops.bitonic import) unless the user already set it."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    rep = tmp_path / "reports"
    rep.mkdir()
    (rep / "bench_tuning.json").write_text(json.dumps(
        {"fused_max_width": 512, "route": "mc_bcsr", "device_ms": 6.1,
         "source": "headline_routes_w512.json"}))
    monkeypatch.delenv("IA_SPGEMM_FUSED_MAX_WIDTH", raising=False)
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p: str(tmp_path))
    t = bench._apply_bench_tuning()
    assert t["fused_max_width"] == 512
    assert os.environ["IA_SPGEMM_FUSED_MAX_WIDTH"] == "512"
    # explicit env wins
    monkeypatch.setenv("IA_SPGEMM_FUSED_MAX_WIDTH", "256")
    assert bench._apply_bench_tuning() is None
