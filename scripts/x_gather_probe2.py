"""Probe: why does the ragged multiclass table gather run ~18x off HBM
bandwidth (measured 10.9 ms for ~470 MB on the headline's 512 class,
reports/mc_profile.json) when the flat expand's same-motif gather runs
near bandwidth?

Variants timed on the real headline 512-class shapes:
  g3d        table[M.T.reshape(-1)].reshape(F, c, 128)  (what ships)
  g2d        table[M.T.reshape(-1)]                     (no 3-D reshape)
  g2d_noT    table[M.reshape(-1)]                       (row-major order)
  g3d_r32    run=32 table (128 useful lanes, F halves — half the volume)
  flatstyle  the flat path's wide-table gather at matched volume
  avg_taa    jnp.take_along_axis a_val fragment map     (what ships)
  avg_flat   flat-index gather a_val.reshape(-1)[idx*ka+E]
  devfrag    _device_fragments (scatter-add build)
  devfrag_1d flat 1-D scatter-add equivalent

Writes reports/gather_probe.json.
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
    plan, W = bitonic.plan_multiclass(
        np.asarray(A_ell.nnz_row), A_ell.max_nnz_per_row,
        a_col_dev=A_ell.col_ind, b_len_dev=A_ell.nnz_row)
    run = plan.run
    # pick the most-populated class
    wsel = max(plan.widths, key=lambda w: int((W == w).sum()))
    idx_np = np.nonzero(W == wsel)[0]
    n_pad = cfg.bucket_capacity(len(idx_np))
    idx = jnp.asarray(np.pad(idx_np, (0, n_pad - len(idx_np)),
                             constant_values=m).astype(np.int32))
    F_c = max(1, int(wsel) // run)
    out = {"class_width": int(wsel), "rows": len(idx_np), "padded": n_pad,
           "F_c": F_c, "run": run}

    def table_for(run_t):
        cm = -(-max(A_ell.max_nnz_per_row, 1) // run_t)
        b_len_h = np.asarray(A_ell.nnz_row).astype(np.int64)
        cnt = np.maximum(-(-np.maximum(b_len_h, 0) // run_t),
                         1).astype(np.int64)
        startp = np.concatenate([[0], np.cumsum(cnt)])
        F_B = int(startp[-1])
        js = np.repeat(np.arange(len(cnt)), cnt)
        within = np.arange(F_B) - np.repeat(startp[:-1], cnt)
        frag_src = js * cm + within
        t = bitonic._ragged_table(
            A_ell.col_ind, A_ell.values,
            jnp.asarray(frag_src.astype(np.int32)), run=run_t, cm=cm)
        return jax.block_until_ready(t), startp, F_B

    table, startp, F_B = table_for(run)
    kt = table.shape[0] - 1
    lanes = table.shape[1]
    startp_d = jnp.asarray(startp.astype(np.int32))
    b_len_d = jnp.asarray(np.asarray(A_ell.nnz_row).astype(np.int32))

    devfrag = jax.jit(lambda: bitonic._device_fragments(
        A_ell.col_ind, b_len_d, startp_d, idx,
        run=run, F_c=F_c, F_B=kt, m=m))
    M_c, E_c = jax.block_until_ready(devfrag())
    gb = n_pad * F_c * lanes * 4 / 1e9

    def t(name, fn, moved_gb):
        j = jax.jit(fn)
        jax.block_until_ready(j())
        d = profiling.device_time_ms(j, chain=4)
        out[name] = {"device_ms": round(d["device_ms"], 3),
                     "gbs": round(moved_gb / max(d["device_ms"], 1e-6)
                                  * 1e3, 1)}
        print(name, out[name], flush=True)

    t("g3d", lambda: table[M_c.T.reshape(-1)].reshape(F_c, n_pad, lanes),
      gb)
    t("g2d", lambda: table[M_c.T.reshape(-1)], gb)
    t("g2d_noT", lambda: table[M_c.reshape(-1)], gb)
    MT = jax.block_until_ready(jnp.asarray(np.asarray(M_c).T.copy()))
    t("g2d_preT", lambda: table[MT.reshape(-1)], gb)
    t("g3d_preT", lambda: table[MT.reshape(-1)].reshape(F_c, n_pad,
                                                        lanes), gb)

    # run=32 table: 128 useful lanes per row, F halves
    if run < 32:
        table32, startp32, F_B32 = table_for(32)
        dev32 = jax.jit(lambda: bitonic._device_fragments(
            A_ell.col_ind,
            b_len_d, jnp.asarray(startp32.astype(np.int32)), idx,
            run=32, F_c=max(1, F_c // (32 // run)),
            F_B=table32.shape[0] - 1, m=m))
        M32, _ = jax.block_until_ready(dev32())
        F32 = M32.shape[1]
        gb32 = n_pad * F32 * table32.shape[1] * 4 / 1e9
        t("g3d_r32", lambda: table32[M32.T.reshape(-1)].reshape(
            F32, n_pad, table32.shape[1]), gb32)

    # flat-style gather at matched row count for reference
    ka = A_ell.col_ind.shape[1]
    chunks_f = -(-max(A_ell.max_nnz_per_row, 1) // run)
    wide, kt_f = bitonic._build_wide_table(A_ell.col_ind, A_ell.values,
                                           run=run, chunks=chunks_f)
    ac = jnp.take(A_ell.col_ind, idx, axis=0)
    rows_f = jnp.where(ac >= 0,
                       jnp.clip(ac * chunks_f, 0, kt_f - 1), kt_f)
    gbf = n_pad * ka * wide.shape[1] * 4 / 1e9
    t("flatstyle", lambda: wide[rows_f.T.reshape(-1)], gbf)

    # a_val fragment map variants
    av_c = jax.block_until_ready(jnp.take(A_ell.values, idx, axis=0))
    gba = n_pad * F_c * 4 / 1e9
    t("avg_taa", lambda: jnp.take_along_axis(
        av_c, jnp.clip(E_c, 0, av_c.shape[1] - 1), axis=1), gba)
    flat_idx = jax.block_until_ready(
        jnp.arange(n_pad, dtype=jnp.int32)[:, None] * av_c.shape[1]
        + jnp.clip(E_c, 0, av_c.shape[1] - 1))
    t("avg_flat", lambda: av_c.reshape(-1)[flat_idx.reshape(-1)].reshape(
        n_pad, F_c), gba)

    t("devfrag", devfrag, 2 * n_pad * (F_c + 1) * 4 / 1e9)

    os.makedirs("reports", exist_ok=True)
    tag = "_smoke" if smoke else ""
    with open(f"reports/gather_probe{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/gather_probe{tag}.json", flush=True)


if __name__ == "__main__":
    main()
