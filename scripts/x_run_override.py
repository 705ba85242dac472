"""A/B the multiclass sub-run length on the chip (one JSON line each).

reports/tablegather_probe.json measured the ragged table gather at
run=32 (128-lane table rows) 2.7x faster than run=16 (64-lane rows the
gather units issue-bind on), on identical useful volume. The planner's
cost model picks run=16 for the headline anyway because the wider run
inflates some rows' pow2 width — this script settles whether the
END-TO-END pipeline agrees with the gather-level probe, on both the
headline (uniform-ish) and the heavy-skew demo.

Writes reports/run_override_ab.json. IA_SPGEMM_BENCH_SMOKE=1 shrinks the
inputs for a CPU crash-check (artifact gets a _smoke suffix).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _skew_matrix(m, seed=0):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    lens = np.where(rng.random(m) < 0.004, 300, rng.integers(4, 16, m))
    rows = np.repeat(np.arange(m), lens)
    cols = rng.integers(0, m, rows.shape[0])
    return sp.coo_matrix(
        (rng.standard_normal(rows.shape[0]).astype(np.float32),
         (rows, cols)), shape=(m, m)).tocsr()


def main():
    import jax

    import bench as hb
    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic

    enable_compilation_cache()
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    out = {}

    def sweep(tag, a):
        A = CSR.from_scipy(a.astype(np.float32))
        A_ell = convert.csr_to_ell(A, check_guard=False)
        ref_sum = float((a @ a).sum())
        for run in (None, 8, 16, 32, 64):
            t0 = time.perf_counter()
            call = bitonic.multiclass_planned(
                A_ell, A_ell, assemble="bcsr", run_override=run)
            plan_s = time.perf_counter() - t0
            name = f"{tag}_run{run if run is not None else 'auto'}"
            if call is None:
                out[name] = {"viable": False}
                print(json.dumps({name: out[name]}), flush=True)
                continue
            C = jax.block_until_ready(call())
            dev = profiling.device_time_ms(call, chain=4)["device_ms"]
            rel = abs(float(C.checksum()) - ref_sum) / max(
                1.0, abs(ref_sum))
            out[name] = {
                "viable": True, "device_ms": round(dev, 3),
                "plan_s": round(plan_s, 2), "nnz": int(C.nnz),
                "rel_err": rel, "run": bitonic.plan_multiclass(
                    np.asarray(A_ell.nnz_row), A_ell.max_nnz_per_row,
                    a_col_dev=A_ell.col_ind, b_len_dev=A_ell.nnz_row,
                    run_override=run)[0].run}
            print(json.dumps({name: out[name]}), flush=True)

    sweep("headline", hb.build_matrix(m=256 if smoke else 32768))
    sweep("skew", _skew_matrix(256 if smoke else 16384))

    os.makedirs("reports", exist_ok=True)
    tag = "_smoke" if smoke else ""
    with open(f"reports/run_override_ab{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/run_override_ab{tag}.json", flush=True)


if __name__ == "__main__":
    main()
