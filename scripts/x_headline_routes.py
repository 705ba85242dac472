"""Measure the headline workload across kernel routes (one JSON line each).

Routes:
  flat      — spgemm_bitonic with the observed out_width cap (today's bench.py)
  flat_sparse — same, compact=False (no compaction stages)
  mc_bcsr   — multiclass width classes, BlockCSR assembly (the csr tiled route)
  mc_ell    — multiclass width classes, unified-ELL assembly
  esc       — global-sort ESC (reference point)

NOTES round-3 lever #2: 45% of headline rows fit width 512; the class route
sorts them there instead of the flat plan's global width. This script decides
whether bench.py's headline flips to the multiclass route.
"""

import json
import os
import sys
import time

import numpy as np

# run as `python scripts/x_headline_routes.py`: sys.path[0] is scripts/,
# so the repo root (bench.py, ia_spgemm_tpu) needs an explicit entry
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    import bench as hb
    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic, esc

    enable_compilation_cache()
    # IA_SPGEMM_BENCH_SMOKE=1: tiny build so the whole script (incl. the
    # artifact write) can be crash-checked on the CPU backend
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    a = hb.build_matrix(m=256) if smoke else hb.build_matrix()
    A = CSR.from_scipy(a.astype(np.float32))
    ref_sum = float((a @ a).sum())
    A_ell = convert.csr_to_ell(A, check_guard=False)
    results = []

    def report(name, run, plan_s=None):
        t0 = time.perf_counter()
        C = jax.block_until_ready(run())
        first_ms = (time.perf_counter() - t0) * 1e3
        dev = profiling.device_time_ms(run, chain=8)["device_ms"]
        rel = abs(float(C.checksum()) - ref_sum) / max(1.0, abs(ref_sum))
        results.append({
            "route": name, "device_ms": round(dev, 3),
            "first_ms": round(first_ms, 1),
            "plan_s": round(plan_s, 2) if plan_s is not None else None,
            "nnz": int(C.nnz), "rel_err": rel})
        print(json.dumps(results[-1]), flush=True)

    # flat bitonic with steady-state out_width (bench.py's current route)
    bt_plan = bitonic.plan_bitonic(A_ell, A_ell)
    if bt_plan.viable:
        C0 = jax.block_until_ready(bitonic.spgemm_bitonic(A_ell, A_ell,
                                                          bt_plan))
        out_w = 128
        max_nnz = int(np.max(np.asarray(C0.nnz_row)))
        while out_w < max_nnz:
            out_w *= 2
        out_w = min(out_w, bt_plan.width)
        report("flat", lambda: bitonic.spgemm_bitonic(
            A_ell, A_ell, bt_plan, out_width=out_w))
        report("flat_sparse", lambda: bitonic.spgemm_bitonic(
            A_ell, A_ell, bt_plan, compact=False))
        # opt-in bf16 value lane (packed single-array sort): a secondary
        # serving-mode metric — rel_err is ~1e-3, never the headline
        try:
            report("flat_bf16", lambda: bitonic.spgemm_bitonic(
                A_ell, A_ell, bt_plan, out_width=out_w,
                value_mode="bf16"))
        except ValueError as e:
            print(json.dumps({"route": "flat_bf16", "skipped": str(e)}),
                  flush=True)
        # both savings at once: packed single-array sort AND no
        # compaction stages — the floor for the serving lane
        try:
            report("flat_bf16_sparse", lambda: bitonic.spgemm_bitonic(
                A_ell, A_ell, bt_plan, value_mode="bf16",
                compact=False))
        except ValueError as e:
            print(json.dumps({"route": "flat_bf16_sparse",
                              "skipped": str(e)}), flush=True)

    t0 = time.perf_counter()
    call = bitonic.multiclass_planned(A_ell, A_ell, assemble="bcsr",
                                      out_width=out_w)
    plan_s = time.perf_counter() - t0
    if call is not None:
        report("mc_bcsr", call, plan_s)
    # plan-materialized gather (pregather=True): steady-state variant —
    # g = table[MT] is a plan constant, so repeated calls skip the
    # issue-bound 64-lane table gather entirely
    t0 = time.perf_counter()
    call = bitonic.multiclass_planned(A_ell, A_ell, assemble="bcsr",
                                      out_width=out_w, pregather=True)
    plan_s = time.perf_counter() - t0
    if call is not None:
        report("mc_bcsr_pg", call, plan_s)

    t0 = time.perf_counter()
    call = bitonic.multiclass_planned(A_ell, A_ell, assemble="ell",
                                      out_width=out_w)
    plan_s = time.perf_counter() - t0
    if call is not None:
        report("mc_ell", call, plan_s)

    # run_override=32: 128-useful-lane table rows gather ~2.7x faster
    # (tablegather_probe preT r32 0.62 vs r16 1.68 ms) at the cost of
    # wider fragment padding — measured head-to-head here
    t0 = time.perf_counter()
    call = bitonic.multiclass_planned(A_ell, A_ell, assemble="bcsr",
                                      out_width=out_w, run_override=32)
    plan_s = time.perf_counter() - t0
    if call is not None:
        report("mc_bcsr_r32", call, plan_s)

    # slab-packed ESC engine (native SlabCSR)
    from ia_spgemm_tpu.ops import slab as slab_mod
    t0 = time.perf_counter()
    scall = slab_mod.plan_slab_csr(A, A)
    plan_s = time.perf_counter() - t0
    if scall is not None:
        report("slab", scall, plan_s)

    esc_plan = esc.plan_spgemm(A, A)
    report("esc", lambda: esc.spgemm_csr(A, A, esc_plan,
                                         engine="global"))

    # persist per-fused-width so scripts/pick_bench_tuning.py can distill
    # the winning (route, fused width) into reports/bench_tuning.json
    os.makedirs("reports", exist_ok=True)
    tag = "smoke_" if smoke else ""
    out = f"reports/headline_routes_{tag}w{bitonic.FUSED_MAX_WIDTH}.json"
    with open(out, "w") as f:
        json.dump({"fused_max_width": bitonic.FUSED_MAX_WIDTH,
                   "results": results}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
