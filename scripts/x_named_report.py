"""Named-SuiteSparse-replica sweep report (VERDICT r4 #9).

The harvest checkpoint stores per-algorithm device/wall times for every
sample, so the named_* replicas' measurements are already a fixture
sweep — this script extracts them (plus each replica's documented
structural targets from io/suitesparse.NAMED_SPECS) into
reports/named_replicas.json without re-spending chip time.

Usage: python scripts/x_named_report.py [checkpoint.npz]
"""

from __future__ import annotations

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from ia_spgemm_tpu.io import suitesparse
    from ia_spgemm_tpu.models import upcycle

    path = sys.argv[1] if len(sys.argv) > 1 \
        else "weights/tpu_samples_v3.npz"
    samples = upcycle.load_samples(path)
    specs = getattr(suitesparse, "NAMED_SPECS", {})
    out = {"source_checkpoint": path, "replicas": {}}
    for s in samples:
        if not s.matrix_name.startswith("named_"):
            continue
        nm = s.matrix_name[len("named_"):].rsplit("_", 1)[0]
        entry = out["replicas"].setdefault(nm, {
            "spec": dict(specs.get(nm, {})) if isinstance(
                specs.get(nm), dict) else str(specs.get(nm, "")),
            "samples": {},
        })
        entry["samples"][s.matrix_name] = {
            "winner": s.winner,
            "times_ms": {k: {"device": v[0], "wall": v[1]}
                         for k, v in s.times.items()},
        }
    out["n_replicas"] = len(out["replicas"])
    out["n_samples"] = sum(len(e["samples"])
                           for e in out["replicas"].values())
    with open("reports/named_replicas.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"n_replicas": out["n_replicas"],
                      "n_samples": out["n_samples"],
                      "names": sorted(out["replicas"])}), flush=True)


if __name__ == "__main__":
    main()
