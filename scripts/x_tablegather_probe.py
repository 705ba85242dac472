"""Decisive table-gather probe: every variant takes table/indices as jit
ARGUMENTS (matching the shipped pipeline's calling convention) instead of
captured constants — x_gather_probe2/x_mc_profile measured the identical
expression at 5.5 vs 10.9 ms because constant capture lets XLA pick
layouts/fold transposes.

Measured on the real headline 512-class shapes:
  flat_expand      the shipped _expand_gather_emajor (ground truth: the
                   flat route's whole-matrix gather, NOTES says ~1.6 ms)
  flat_pipeline    full spgemm_bitonic device time (sanity: ~10 ms)
  rag_g3d          f(table, M) = table[M.T.reshape(-1)].reshape(F,n,l)
  rag_g3d_preT     f(table, MT) = table[MT.reshape(-1)].reshape(F,n,l)
  rag_g3d_r32      run=32 table (128 useful lanes, volume halves)
  rag_g3d_r32_preT pre-transposed + run=32

Writes reports/tablegather_probe.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import bench as hb
    from ia_spgemm_tpu import config as cfg
    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic

    enable_compilation_cache()
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    a = hb.build_matrix(m=256 if smoke else 32768).astype(np.float32)
    A = CSR.from_scipy(a)
    A_ell = convert.csr_to_ell(A, check_guard=False)
    m = A.nrows
    out = {}

    def t(name, fn, *args, moved_gb=0.0):
        j = jax.jit(fn)
        jax.block_until_ready(j(*args))
        d = profiling.device_time_ms(lambda: j(*args), chain=4)
        out[name] = {"device_ms": round(d["device_ms"], 3),
                     "gbs": round(moved_gb / max(d["device_ms"], 1e-6)
                                  * 1e3, 1)}
        print(name, out[name], flush=True)

    # --- ground truth: the flat route's own gather + full pipeline ----
    bplan = bitonic.plan_bitonic(A_ell, A_ell)
    if bplan.viable:
        chunks = bplan.chunks
        run_f = bplan.run
        ka = A_ell.col_ind.shape[1]
        ka_eff = ka * chunks
        gb_f = m * ka_eff * max(128, 4 * run_f) * 4 / 1e9
        t("flat_expand",
          lambda ac, av, bc, bv: bitonic._expand_gather_emajor(
              ac, av, bc, bv, run=run_f, chunks=chunks),
          A_ell.col_ind, A_ell.values, A_ell.col_ind, A_ell.values,
          moved_gb=gb_f)
        d = profiling.device_time_ms(
            lambda: bitonic.spgemm_bitonic(A_ell, A_ell, bplan), chain=2)
        out["flat_pipeline"] = {"device_ms": round(d["device_ms"], 3),
                                "width": bplan.width, "run": run_f,
                                "chunks": chunks, "ka_eff": ka_eff}
        print("flat_pipeline", out["flat_pipeline"], flush=True)

    # --- ragged 512-class gather, argument-passing variants ------------
    plan, W = bitonic.plan_multiclass(
        np.asarray(A_ell.nnz_row), A_ell.max_nnz_per_row,
        a_col_dev=A_ell.col_ind, b_len_dev=A_ell.nnz_row)
    if not plan.ragged:
        print("plan not ragged; skipping ragged variants")
        _write(out, smoke)
        return
    run = plan.run
    wsel = max(plan.widths, key=lambda w: int((W == w).sum()))
    idx_np = np.nonzero(W == wsel)[0]
    n_pad = cfg.bucket_capacity(max(len(idx_np), 1))
    idx = jnp.asarray(np.pad(idx_np, (0, n_pad - len(idx_np)),
                             constant_values=m).astype(np.int32))
    out["class"] = {"width": int(wsel), "rows": len(idx_np),
                    "padded": n_pad, "run": run}

    def table_and_M(run_t):
        cm = -(-max(A_ell.max_nnz_per_row, 1) // run_t)
        b_len_h = np.asarray(A_ell.nnz_row).astype(np.int64)
        cnt = np.maximum(-(-np.maximum(b_len_h, 0) // run_t),
                         1).astype(np.int64)
        startp = np.concatenate([[0], np.cumsum(cnt)])
        js = np.repeat(np.arange(len(cnt)), cnt)
        within = np.arange(int(startp[-1])) - np.repeat(startp[:-1], cnt)
        frag_src = js * cm + within
        table = jax.block_until_ready(bitonic._ragged_table(
            A_ell.col_ind, A_ell.values,
            jnp.asarray(frag_src.astype(np.int32)), run=run_t, cm=cm))
        F_c = max(1, int(wsel) // run_t)
        M, E = jax.block_until_ready(jax.jit(
            lambda: bitonic._device_fragments(
                A_ell.col_ind,
                jnp.asarray(b_len_h.astype(np.int32)),
                jnp.asarray(startp.astype(np.int32)), idx,
                run=run_t, F_c=F_c, F_B=table.shape[0] - 1, m=m))())
        return table, M, F_c

    for run_t, tag in ((run, ""), (32, "_r32")):
        if run_t == 32 and run == 32 and tag:
            continue
        table, M, F_c = table_and_M(run_t)
        lanes = table.shape[1]
        gb = n_pad * F_c * lanes * 4 / 1e9
        t(f"rag_g3d{tag}",
          lambda tb, Mx, F_c=F_c, lanes=lanes:
          tb[Mx.T.reshape(-1)].reshape(F_c, n_pad, lanes),
          table, M, moved_gb=gb)
        MT = jax.block_until_ready(jnp.asarray(np.asarray(M).T.copy()))
        t(f"rag_g3d_preT{tag}",
          lambda tb, Mx, F_c=F_c, lanes=lanes:
          tb[Mx.reshape(-1)].reshape(F_c, n_pad, lanes),
          table, MT, moved_gb=gb)

    _write(out, smoke)


def _write(out, smoke):
    os.makedirs("reports", exist_ok=True)
    tag = "_smoke" if smoke else ""
    with open(f"reports/tablegather_probe{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/tablegather_probe{tag}.json", flush=True)


if __name__ == "__main__":
    main()
