"""Per-stage device profile of the TUNED headline route (mc_bcsr_pg:
run=8 pregather, fused width<=512, BlockCSR assembly) — VERDICT r4 #3.

Times each class's fused expand+sort+compress kernel on its
plan-materialized (g, AVT) inputs, the full call, and variants
(out_width cap, compact=False to split compress cost out of the sort).
Writes reports/pg_profile.json.

Usage: python scripts/x_pg_profile.py [--smoke]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    enable_compilation_cache()
    import jax

    from bench import build_matrix, _observed_out_width
    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic

    m = 256 if smoke else 32768
    run = 8
    a = build_matrix(m=m) if not smoke else build_matrix(m=m, band=2, extra_per_row=8, seed=0)
    A = CSR.from_scipy(a.astype(np.float32))
    E = convert.csr_to_ell(A)
    jax.block_until_ready(E.col_ind)

    res = {"m": m, "run": run}
    plan, W = bitonic.plan_multiclass(
        np.asarray(E.nnz_row), E.max_nnz_per_row,
        a_col_dev=E.col_ind, b_len_dev=E.nnz_row, run_override=run)
    res["widths"] = [int(w) for w in plan.widths]
    res["class_rows"] = [int((W == w).sum()) for w in plan.widths]

    call0 = bitonic.multiclass_planned(E, E, assemble="bcsr",
                                       pregather=True, run_override=run)
    C0 = jax.block_until_ready(call0())
    out_w = _observed_out_width(C0.nnz_row, int(plan.widths[-1]))
    res["out_w"] = int(out_w)
    call = bitonic.multiclass_planned(E, E, assemble="bcsr",
                                      out_width=out_w, pregather=True,
                                      run_override=run)
    d = profiling.device_time_ms(call, chain=2 if smoke else 8)
    res["full_call_ms"] = d["device_ms"]

    # rebuild each class's plan-time artifacts exactly as the build does
    from ia_spgemm_tpu.utils import hostcache
    b_len_h = hostcache.host_view(E.nnz_row).astype(np.int64)
    from ia_spgemm_tpu import config as cfg
    cm = -(-max(E.max_nnz_per_row, 1) // run)
    b_frag_cnt = np.maximum(-(-np.maximum(b_len_h, 0) // run),
                            1).astype(np.int64)
    startp = np.concatenate([[0], np.cumsum(b_frag_cnt)])
    F_B = int(startp[-1])
    js = np.repeat(np.arange(len(b_frag_cnt)), b_frag_cnt)
    within_b = np.arange(F_B) - np.repeat(startp[:-1], b_frag_cnt)
    frag_src = js * cm + within_b
    import jax.numpy as jnp
    table = bitonic._ragged_table(E.col_ind, E.values,
                                  jnp.asarray(frag_src.astype(np.int32)),
                                  run=run, cm=cm)
    kt = int(table.shape[0]) - 1
    res["stages"] = {}
    for c, w in enumerate(plan.widths):
        w = int(w)
        idx = np.nonzero(np.asarray(W) == w)[0]
        n_pad = cfg.bucket_capacity(max(len(idx), 1))
        idx_d = jnp.asarray(np.pad(idx, (0, n_pad - len(idx)),
                                   constant_values=m).astype(np.int32))
        F_c = max(1, w // run)
        pack = bitonic._pg_pack(run, w)
        g, avt = bitonic._pregather_class(
            E.col_ind, E.values, E.nnz_row, idx_d, table,
            run=run, F_c=F_c, F_B=kt, m=m, gather=True, pack=pack)
        jax.block_until_ready(g)
        out_c = min(out_w, w)
        st = {"rows": int(len(idx)), "padded": int(n_pad), "F_c": F_c,
              "pack": pack, "g_mb": round(g.size * 4 / 1e6, 1)}

        def sc(compact=True, oc=out_c):
            return bitonic._sort_compress_from_gather(
                g, avt, width=w, run=run, ka=F_c, start_kk=2 * run,
                interpret=smoke, static_strides=not smoke,
                out_width=oc, compact=compact, pack=pack,
                row_major_out=oc <= bitonic._ROW_MAJOR_OUT_MAX)

        d = profiling.device_time_ms(sc, chain=2 if smoke else 8)
        st["fused_ms"] = d["device_ms"]
        # compact=False skips the compress routing/write: the delta is
        # the compress epilogue's cost inside the fused kernel
        d = profiling.device_time_ms(lambda: sc(compact=False),
                                     chain=2 if smoke else 8)
        st["sort_only_ms"] = d["device_ms"]
        res["stages"][str(w)] = st
        print(json.dumps({str(w): st}), flush=True)

    kernels = sum(s["fused_ms"] for s in res["stages"].values())
    res["sum_class_kernels_ms"] = round(kernels, 3)
    res["assembly_plus_epilogue_ms"] = round(
        res["full_call_ms"] - kernels, 3)
    out_path = ("reports/pg_profile_smoke.json" if smoke
                else "reports/pg_profile.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
