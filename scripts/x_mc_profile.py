"""Per-stage device profile of the multiclass (width-class) pipeline.

The end-to-end numbers (headline mc ~53 ms vs flat 10.6 ms; skew mc
492 ms vs its own 0.7 ms speed-of-light) say the ragged machinery is
paying an order of magnitude somewhere — this script times each stage
of `bitonic._multiclass_fn` in isolation on the chip so the fix targets
the measured cost, not a guess:

  devfrag      _device_fragments (per-call scatter-add + cumsum build)
  avgather     a_val row-take + per-fragment take_along_axis
  tablegather  packed B-table row gather at the class's fragment list
  sortcompress the Pallas expand+sort+compress kernels
  e2e_dev      multiclass_planned(plan_device=True)   (what ships today)
  e2e_host     multiclass_planned(plan_device=False)  (fragments at plan)

Writes reports/mc_profile.json. IA_SPGEMM_BENCH_SMOKE=1 shrinks shapes
for a CPU crash-check.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_skew(m=32768, heavy=400, smoke=False):
    import scipy.sparse as sp
    if smoke:
        m, heavy = 512, 64
    rng = np.random.default_rng(3)
    lens = np.where(rng.random(m) < 0.002, heavy,
                    rng.integers(2, 6, m) if smoke
                    else rng.integers(8, 24, m))
    rows = np.repeat(np.arange(m), lens)
    cols = rng.integers(0, m, rows.shape[0])
    a = sp.coo_matrix((rng.standard_normal(rows.shape[0]).astype(
        np.float32), (rows, cols)), shape=(m, m)).tocsr()
    a.sum_duplicates()
    return a


def profile_workload(name, a, out):
    import jax
    import jax.numpy as jnp

    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic

    A = CSR.from_scipy(a)
    A_ell = convert.csr_to_ell(A, check_guard=False)
    m = A.nrows
    res = {"m": m, "nnz": int(A.nnz)}

    # --- planning cost breakdown -------------------------------------
    t0 = time.perf_counter()
    plan, W = bitonic.plan_multiclass(
        np.asarray(A_ell.nnz_row), A_ell.max_nnz_per_row,
        a_col_dev=A_ell.col_ind, b_len_dev=A_ell.nnz_row)
    res["plan_multiclass_s"] = round(time.perf_counter() - t0, 2)
    res["plan"] = {"run": plan.run, "widths": list(plan.widths),
                   "ragged": plan.ragged, "viable": plan.viable}
    if not plan.viable:
        out[name] = res
        return
    res["class_rows"] = [(int(w), int((W == w).sum()))
                         for w in np.unique(W)]
    # per-candidate _frag_rows_dev device time (the planner calls this
    # once per pow2 run candidate)
    d = profiling.device_time_ms(
        lambda: bitonic._frag_rows_dev(A_ell.col_ind, A_ell.nnz_row,
                                       jnp.int32(plan.run)), chain=4)
    res["frag_rows_dev_ms_per_candidate"] = round(d["device_ms"], 3)

    run = plan.run
    widths = plan.widths
    cm = -(-max(A_ell.max_nnz_per_row, 1) // run)
    b_len_h = np.asarray(A_ell.nnz_row).astype(np.int64)
    b_frag_cnt = np.maximum(-(-np.maximum(b_len_h, 0) // run),
                            1).astype(np.int64)
    startp = np.concatenate([[0], np.cumsum(b_frag_cnt)])
    F_B = int(startp[-1])
    js = np.repeat(np.arange(len(b_frag_cnt)), b_frag_cnt)
    within_b = np.arange(F_B) - np.repeat(startp[:-1], b_frag_cnt)
    frag_src = js * cm + within_b
    table = bitonic._ragged_table(
        A_ell.col_ind, A_ell.values,
        jnp.asarray(frag_src.astype(np.int32)), run=run, cm=cm)
    table = jax.block_until_ready(table)
    kt = table.shape[0] - 1
    lanes = table.shape[1]
    startp_d = jnp.asarray(startp.astype(np.int32))
    b_len_d = jnp.asarray(b_len_h.astype(np.int32))

    from ia_spgemm_tpu import config as cfg
    res["stages"] = {}
    total_stage_ms = 0.0
    for w in widths:
        idx_np = np.nonzero(W == w)[0]
        n_pad = cfg.bucket_capacity(max(len(idx_np), 1))
        idx = jnp.asarray(np.pad(idx_np, (0, n_pad - len(idx_np)),
                                 constant_values=m).astype(np.int32))
        F_c = max(1, int(w) // run)
        st = {"rows": len(idx_np), "padded": n_pad, "F_c": F_c}

        devfrag = jax.jit(lambda idx=idx, F_c=F_c: bitonic._device_fragments(
            A_ell.col_ind, b_len_d, startp_d, idx,
            run=run, F_c=F_c, F_B=kt, m=m))
        M_c, E_c = jax.block_until_ready(devfrag())
        d = profiling.device_time_ms(devfrag, chain=4)
        st["devfrag_ms"] = round(d["device_ms"], 3)

        def avg(idx=idx, E_c=E_c):
            av_c = jnp.take(A_ell.values, idx, axis=0)
            return jnp.take_along_axis(
                av_c, jnp.clip(E_c, 0, av_c.shape[1] - 1), axis=1)
        avg_j = jax.jit(avg)
        av_f = jax.block_until_ready(avg_j())
        d = profiling.device_time_ms(avg_j, chain=4)
        st["avgather_ms"] = round(d["device_ms"], 3)

        if w <= bitonic.TRANSPOSED_MAX_WIDTH:
            def tg(M_c=M_c, F_c=F_c, n_pad=n_pad):
                return table[M_c.T.reshape(-1)].reshape(F_c, n_pad, lanes)
            tg_j = jax.jit(tg)
            g = jax.block_until_ready(tg_j())
            d = profiling.device_time_ms(tg_j, chain=4)
            st["tablegather_ms"] = round(d["device_ms"], 3)
            avT = jax.block_until_ready(jnp.asarray(av_f.T))
            sc = lambda g=g, avT=avT, w=w, F_c=F_c: \
                bitonic._sort_compress_from_gather(
                    g, avT, width=int(w), run=run, ka=F_c,
                    start_kk=2 * run, interpret=False,
                    static_strides=int(w) <= bitonic._COLS_STATIC_MAX_WIDTH,
                    out_width=int(w))
            jax.block_until_ready(sc())
            d = profiling.device_time_ms(sc, chain=4)
            st["sortcompress_ms"] = round(d["device_ms"], 3)
        else:
            # wide-class rows-layout path: XLA expand then rows kernel
            def wide(M_c=M_c, av_f=av_f, w=w, F_c=F_c, n_pad=n_pad):
                g2 = table[M_c.reshape(-1)].reshape(n_pad, F_c, lanes)
                par = (jax.lax.broadcasted_iota(
                    jnp.int32, (1, F_c, 1), 1) & 1) == 1
                bc = jnp.where(par, g2[:, :, 2 * run:3 * run],
                               g2[:, :, :run])
                bvb = jnp.where(par, g2[:, :, 3 * run:4 * run],
                                g2[:, :, run:2 * run])
                bv = jax.lax.bitcast_convert_type(bvb, jnp.float32)
                valid = bc >= 0
                key = jnp.where(valid, bc, bitonic.SENTINEL).reshape(
                    n_pad, F_c * run)
                val = jnp.where(valid, av_f[:, :, None] * bv,
                                0.0).reshape(n_pad, F_c * run)
                pad = int(w) - F_c * run
                if pad:
                    key = jnp.pad(key, ((0, 0), (0, pad)),
                                  constant_values=bitonic.SENTINEL)
                    val = jnp.pad(val, ((0, 0), (0, pad)))
                return key, val
            wide_j = jax.jit(wide)
            key, val = jax.block_until_ready(wide_j())
            d = profiling.device_time_ms(wide_j, chain=4)
            st["wide_expand_ms"] = round(d["device_ms"], 3)
            tile_rows = max(8, min(512, bitonic._TILE_ELEMS // int(w)))
            sc = lambda key=key, val=val, w=w, tile_rows=tile_rows: \
                bitonic._sort_compress_rows(
                    key, val, width=int(w), start_kk=2 * run,
                    tile_rows=tile_rows, interpret=False,
                    static_strides=int(w) <= bitonic.STATIC_STRIDE_MAX_WIDTH)
            jax.block_until_ready(sc())
            d = profiling.device_time_ms(sc, chain=4)
            st["sortcompress_ms"] = round(d["device_ms"], 3)
        total_stage_ms += sum(v for k, v in st.items()
                              if k.endswith("_ms"))
        res["stages"][str(int(w))] = st
    res["sum_stage_ms"] = round(total_stage_ms, 2)

    # --- end-to-end: plan modes + forced layouts ----------------------
    for label, kw in (("e2e_dev", {"plan_device": True}),
                      ("e2e_host", {"plan_device": False}),
                      ("e2e_chunked", {"layout": "chunked"})):
        t0 = time.perf_counter()
        call = bitonic.multiclass_planned(A_ell, A_ell, assemble="bcsr",
                                          **kw)
        plan_s = time.perf_counter() - t0
        if call is None:
            res[label] = None
            continue
        C = jax.block_until_ready(call())
        d = profiling.device_time_ms(call, chain=4)
        res[label] = {"device_ms": round(d["device_ms"], 3),
                      "plan_s": round(plan_s, 2),
                      "nnz": int(C.nnz)}
        bitonic.clear_plan_cache()
    out[name] = res
    print(json.dumps({name: res}), flush=True)


def main():
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    enable_compilation_cache()
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    import bench as hb
    out = {}
    profile_workload("headline",
                     hb.build_matrix(m=256 if smoke else 32768).astype(
                         np.float32), out)
    profile_workload("skew", build_skew(smoke=smoke), out)
    tag = "_smoke" if smoke else ""
    os.makedirs("reports", exist_ok=True)
    with open(f"reports/mc_profile{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/mc_profile{tag}.json", flush=True)


if __name__ == "__main__":
    main()
