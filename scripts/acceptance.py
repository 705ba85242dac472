"""Acceptance run: the reference driver's workload over its own Inputs/
fixture suite, end-to-end on the TPU, plus a per-kernel roofline table on
the headline matrix. Writes JSON artifacts under reports/.

Usage: python scripts/acceptance.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def fixture_sweeps():
    from ia_spgemm_tpu.bench import harness, report as report_mod
    from ia_spgemm_tpu.io import suitesparse

    out = {}
    for name, path in sorted(suitesparse.local_collection().items()):
        from ia_spgemm_tpu.io import mmio
        try:
            A = mmio.read_mtx_to_csr(path)
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": str(e)}
            continue
        if A.nrows != A.ncols:
            # rectangular fixtures run the GPU-style A @ A^T workload
            from ia_spgemm_tpu.formats import convert
            B = convert.transpose_csr(A)
        else:
            B = A
        t0 = time.time()
        rep = harness.run_benchmark(
            A, B, harness.ALGORITHMS + ("bitonic", "compensated", "dense"),
            matrix_a=name, matrix_b=name, iters=2)
        d = json.loads(report_mod.to_json(rep))
        d["sweep_seconds"] = round(time.time() - t0, 1)
        out[name] = d
        ok = [r["name"] for r in d["results"] if r.get("ok")]
        print(f"{name}: winner={d['winner']} ok={ok}", flush=True)
    return out


def headline_rooflines():
    import jax

    from bench import build_matrix
    from ia_spgemm_tpu.bench import profiling, roofline
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic, dia as dia_ops, esc

    # IA_SPGEMM_BENCH_SMOKE=1: tiny shapes so every code path (incl. the
    # skew entries and artifact writes) can be crash-checked on CPU
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    a = build_matrix(m=256) if smoke else build_matrix()
    A = CSR.from_scipy(a.astype(np.float32))
    out = {}

    from ia_spgemm_tpu.ops import slab as slab_mod
    plan = esc.plan_spgemm(A, A)
    C = esc.spgemm_csr(A, A, plan, engine="global")
    cost = roofline.cost_esc(plan.expansion_capacity, int(A.nnz),
                             int(A.nnz), int(C.nnz))
    # the ESC engine as the harness benches it: slab-packed VMEM sort
    # when viable (native SlabCSR out, like the other routes' native
    # formats), global device sort otherwise
    scall = slab_mod.plan_slab_csr(A, A)
    if scall is not None:
        r = profiling.time_op(scall, iters=5)
        dev = profiling.device_time_ms(scall, chain=8)
        out["esc_csr"] = roofline.analyze(r["median_ms"], cost)
        out["esc_csr"]["device_ms"] = dev["device_ms"]
        out["esc_csr"]["engine"] = "slab"
        out["esc_csr"]["roofline_device"] = roofline.analyze(
            dev["device_ms"], cost) if dev["device_ms"] > 0 else None
        # converter-inclusive: native SlabCSR flattened to exact CSR.
        # gather = production (piecewise-linear source map, VERDICT r4
        # #7); scatter = the drop-mode formulation it replaced (A/B)
        Cs_flat = scall()
        r2 = profiling.time_op(
            lambda: slab_mod.slab_to_csr(Cs_flat,
                                         out_cap=scall.plan.out_cap),
            iters=3)
        out["esc_csr_to_flat"] = roofline.analyze(r2["median_ms"], cost)
        out["esc_csr_to_flat"]["engine"] = "gather"
        r2s = profiling.time_op(
            lambda: slab_mod.slab_to_csr(Cs_flat, engine="scatter",
                                         out_cap=scall.plan.out_cap),
            iters=3)
        out["esc_csr_to_flat_scatter"] = roofline.analyze(
            r2s["median_ms"], cost)
    # the forced global-sort engine (A/B baseline for the slab engine;
    # also the fp64 path)
    r = profiling.time_op(
        lambda: esc.spgemm_csr(A, A, plan, engine="global"), iters=5)
    out["esc_csr_global_sort"] = roofline.analyze(r["median_ms"], cost)
    if scall is None:
        out["esc_csr"] = dict(out["esc_csr_global_sort"],
                              engine="global_sort")

    # the PRODUCTION csr path (tiled width-class route when viable) —
    # plan once like the harness does, time the steady-state kernel
    tiled = esc.plan_csr_tiled(A, A)
    if tiled is not None:
        r = profiling.time_op(tiled, iters=5)
        out["esc_auto_tiled"] = roofline.analyze(r["median_ms"], cost)
        out["esc_auto_tiled"]["vs_global_sort"] = round(
            out["esc_csr"]["time_ms"] / r["median_ms"], 2)

    A_ell = convert.csr_to_ell(A, check_guard=False)
    bplan = bitonic.plan_bitonic(A_ell, A_ell)
    if bplan.viable:
        r = profiling.time_op(
            lambda: bitonic.spgemm_bitonic(A_ell, A_ell, bplan), iters=5)
        cost = roofline.cost_bitonic(A.nrows, bplan.width, int(A.nnz))
        out["bitonic"] = roofline.analyze(r["median_ms"], cost)

    # NOTE: compensated timing here is dominated by pulling the (hi, lo)
    # f64 value arrays to the host over the dev tunnel (~84 MB); on-device
    # compute is ESC-like. Production hosts pay ~10 ms for that D2H.
    r = profiling.time_op(lambda: esc.spgemm_csr_compensated(A, A), iters=3)
    cost = roofline.cost_esc(esc.plan_spgemm(A, A).expansion_capacity,
                             int(A.nnz), int(A.nnz), int(C.nnz),
                             value_bytes=8)
    out["compensated"] = roofline.analyze(r["median_ms"], cost)
    dev = profiling.device_time_ms(
        lambda: esc.spgemm_csr_compensated(A, A), chain=4)
    out["compensated"]["device_ms"] = dev["device_ms"]
    if dev["device_ms"] > 0:
        out["compensated"]["roofline_device"] = roofline.analyze(
            dev["device_ms"], cost)

    # dense_row is the narrow-dense-output strategy; the headline's square
    # n=32768 dense B (4.3 GB) is out of scope by design, so its roofline
    # runs the same A against a dense B with n=2048 (SpMM-shaped C).
    from ia_spgemm_tpu.formats.types import Dense
    from ia_spgemm_tpu.ops import dense_row as dr_ops
    n_dr = 2048
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    B_dr = Dense(values=jnp.asarray(
        rng.standard_normal((A.ncols, n_dr)), jnp.float32))
    r = profiling.time_op(
        lambda: dr_ops.spgemm_dense_row(A_ell, B_dr), iters=5)
    cost = roofline.cost_dense_row(A.nrows, A_ell.col_ind.shape[1], n_dr,
                                   int(A.nnz))
    out["dense_row"] = roofline.analyze(r["median_ms"], cost)

    nd = len(convert.plan_dia_offsets(A))
    if nd <= 64:  # the headline's random entries occupy ~every diagonal
        Ad = convert.csr_to_dia(A, check_guard=False)
        r = profiling.time_op(lambda: dia_ops.spgemm_dia(Ad, Ad), iters=3)
        cost = roofline.cost_dia(A.nrows, nd, nd, 2 * nd)
        out["dia"] = roofline.analyze(r["median_ms"], cost)

    # heavy-skew workload (the matrices that used to fall off the fast
    # path): a few 2000-nnz rows among 5-nnz rows — the FLAT bitonic plan
    # is inviable, the width-class kernel keeps each row at its own pow2
    # width. Reported vs scipy (the vendor-baseline role).
    import time as _time

    import scipy.sparse as sp
    rng = np.random.default_rng(3)
    m_s = 512 if smoke else 32768
    lens = np.where(rng.random(m_s) < 0.002, 64 if smoke else 400,
                    rng.integers(2, 6, m_s) if smoke
                    else rng.integers(8, 24, m_s))
    rows = np.repeat(np.arange(m_s), lens)
    cols = rng.integers(0, m_s, rows.shape[0])
    a_skew = sp.coo_matrix(
        (rng.standard_normal(rows.shape[0]).astype(np.float32),
         (rows, cols)), shape=(m_s, m_s)).tocsr()
    a_skew.sum_duplicates()
    A_skew = CSR.from_scipy(a_skew)
    A_skew_ell = convert.csr_to_ell(A_skew, check_guard=False)
    if not smoke:  # the tiny smoke skew can be flat-viable; that's fine
        assert not bitonic.plan_bitonic(A_skew_ell, A_skew_ell).viable
    t0 = _time.perf_counter()
    call0 = bitonic.multiclass_planned(A_skew_ell, A_skew_ell)
    plan_s = _time.perf_counter() - t0
    C_skew = jax.block_until_ready(call0())
    c_ref = a_skew @ a_skew
    _st = []
    for _ in range(3):  # median — this host's scipy varies ~13x with load
        t0 = _time.perf_counter()
        a_skew @ a_skew
        _st.append((_time.perf_counter() - t0) * 1e3)
    scipy_skew_ms = float(np.median(_st))
    rel = abs(float(C_skew.checksum()) - float(c_ref.sum())) / max(
        1.0, abs(float(c_ref.sum())))
    mx = int(np.max(np.asarray(C_skew.nnz_row)))
    ow = 128
    while ow < mx:
        ow *= 2
    del C_skew
    # steady state: planned once, output capped to the observed bound.
    # bcsr is the production assembly for skewed outputs (the harness's
    # choice): per-class compact blocks gathered into 128-aligned
    # BlockCSR, nnz-scaled, vs the ELL mode's (m, out_w) scatter.
    mc_plan, W_skew = bitonic.plan_multiclass(
        np.asarray(A_skew_ell.nnz_row), A_skew_ell.max_nnz_per_row,
        a_col_dev=A_skew_ell.col_ind, b_len_dev=A_skew_ell.nnz_row)
    class_rows = [(int((W_skew == w).sum()), int(w))
                  for w in np.unique(W_skew)]
    cost_mc = roofline.cost_multiclass(class_rows, int(A_skew.nnz),
                                       int(c_ref.nnz))
    for mode in ("ell", "bcsr", "bcsr_pg"):
        call = bitonic.multiclass_planned(
            A_skew_ell, A_skew_ell, out_width=ow,
            assemble="bcsr" if mode == "bcsr_pg" else mode,
            pregather=mode == "bcsr_pg")
        r = profiling.time_op(call, iters=3)
        # chain=2 differences a single pair of tunnel RTTs — measured
        # wildly unstable on sub-20ms kernels (slab_probe history);
        # chain=6 amortizes
        dev = profiling.device_time_ms(call, chain=6)
        key = {"bcsr": "multiclass_skew",
               "ell": "multiclass_skew_ell",
               "bcsr_pg": "multiclass_skew_pg"}[mode]
        out[key] = {
            "wall_ms": r["median_ms"],
            "device_ms": dev["device_ms"],
            "plan_seconds": round(plan_s, 1),
            "scipy_ms": scipy_skew_ms,
            "speedup_vs_scipy": scipy_skew_ms / r["median_ms"],
            "checksum_rel_err": rel,
            "nnz": int(A_skew.nnz),
            "flat_plan_viable": False,
            "assembly": mode,
            "roofline_device": roofline.analyze(dev["device_ms"], cost_mc)
            if dev["device_ms"] > 0 else None,
        }

    # the ESC fallback on the same skew workload — the route the harness
    # takes if the class planner were unavailable: slab engine when its
    # width cap admits the heavy rows, global sort otherwise
    from ia_spgemm_tpu.ops import slab as slab_mod
    skew_call = slab_mod.plan_slab_csr(A_skew, A_skew)
    if skew_call is not None:
        run_skew = skew_call
        eng = "slab"
    else:
        # heavy rows past the slab cap: slab for the light 99.7%,
        # global sort for the residual
        skew_call = slab_mod.plan_slab_hybrid(A_skew, A_skew)
        if skew_call is not None:
            run_skew = skew_call
            eng = f"slab+global_hybrid({skew_call.n_heavy} heavy rows)"
        else:
            skew_plan = esc.plan_spgemm(A_skew, A_skew)
            run_skew = lambda: esc.spgemm_csr(  # noqa: E731
                A_skew, A_skew, skew_plan, engine="global")
            eng = "global_sort"
    r = profiling.time_op(run_skew, iters=3)
    dev = profiling.device_time_ms(run_skew, chain=2)
    out["skew_esc_fallback"] = {
        "wall_ms": r["median_ms"], "device_ms": dev["device_ms"],
        "engine": eng,
        "scipy_ms": scipy_skew_ms,
        "speedup_vs_scipy": scipy_skew_ms / r["median_ms"],
    }

    # VERDICT r4 #4 acceptance: the AUTO route (calibrated cost-model
    # dispatch, esc.plan_csr_auto) on the same skew matrix must land
    # within 10% of the manual fallback's win. Timed like every steady
    # state consumer: pipelined wall (N dispatches, one sync) — the
    # single-call wall carries the ~28 ms tunnel sync RTT, which is a
    # measurement artifact, not route cost (bench/profiling.py).
    auto_route, auto_call = esc.plan_csr_auto(A_skew, A_skew)
    auto_dev = profiling.device_time_ms(auto_call, chain=6)
    auto_pipe = profiling.pipelined_wall_ms(auto_call, n=8)
    out["esc_auto_skew"] = {
        "route": auto_route,
        "device_ms": auto_dev["device_ms"],
        "pipelined_wall_ms": auto_pipe["pipelined_wall_ms"],
        "single_wall_ms": auto_dev["single_ms"],
        "scipy_ms": scipy_skew_ms,
        "speedup_vs_scipy":
            scipy_skew_ms / auto_pipe["pipelined_wall_ms"],
    }

    # dense_row's winning workload class: SpMM-shaped C = A_sparse @
    # B_dense (n = 2048). The sparse engines are out of contention (B
    # densified as sparse explodes E); the honest comparison is the
    # vendor-baseline role, scipy's CSR @ dense ndarray.
    b_dense_np = np.asarray(
        np.random.default_rng(1).standard_normal(
            (A.ncols, n_dr)), np.float32)
    a_host = A.to_scipy()
    _st2 = []
    for _ in range(3):
        t0 = _time.perf_counter()
        a_host @ b_dense_np
        _st2.append((_time.perf_counter() - t0) * 1e3)
    scipy_spmm_ms = float(np.median(_st2))
    B_dr2 = Dense(values=jnp.asarray(b_dense_np))
    r = profiling.time_op(
        lambda: dr_ops.spgemm_dense_row(A_ell, B_dr2), iters=5)
    out["dense_row_spmm_win"] = {
        "wall_ms": r["median_ms"],
        "scipy_csr_at_dense_ms": scipy_spmm_ms,
        "speedup_vs_scipy": scipy_spmm_ms / r["median_ms"],
        "n_dense": n_dr,
    }

    jax.block_until_ready(C.values)
    return out


def main():
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    enable_compilation_cache()
    os.makedirs("reports", exist_ok=True)
    # smoke runs must not overwrite the real chip artifacts
    tag = "_smoke" if os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1" else ""
    if "--rooflines-only" not in sys.argv:
        sweeps = fixture_sweeps()
        with open(f"reports/fixture_sweeps{tag}.json", "w") as f:
            json.dump(sweeps, f, indent=2)
    roofs = headline_rooflines()
    with open(f"reports/headline_rooflines{tag}.json", "w") as f:
        json.dump(roofs, f, indent=2)
    print(json.dumps({k: {"time_ms": v.get("time_ms", v.get("wall_ms")),
                          "pct_of_sol": v.get("pct_of_sol")}
                      for k, v in roofs.items()}))


if __name__ == "__main__":
    main()
