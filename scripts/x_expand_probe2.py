"""Scratch probe 2: decompose expand_wide and the transpose_in cost."""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_matrix
    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic

    enable_compilation_cache()
    a = build_matrix()
    A = CSR.from_scipy(a.astype(np.float32))
    A_ell = convert.csr_to_ell(A, check_guard=False)
    plan = bitonic.plan_bitonic(A_ell, A_ell)
    ac, av = A_ell.col_ind, A_ell.values
    m, ka = ac.shape
    k = ac.shape[0]
    run = plan.run
    out = {}

    # stage A: wide gather alone (table built inside jit, like expand_wide)
    @jax.jit
    def gather_only(a_col, b_col, b_val):
        kb = b_col.shape[1]
        bc_p = jnp.pad(b_col, ((0, 0), (0, run - kb)), constant_values=-1)
        bv_p = jnp.pad(b_val, ((0, 0), (0, run - kb)))
        bvb = jax.lax.bitcast_convert_type(bv_p, jnp.int32)
        wide = jnp.concatenate(
            [bc_p, bvb, jnp.flip(bc_p, axis=1), jnp.flip(bvb, axis=1)],
            axis=1)
        wide = jnp.pad(wide, ((0, 1), (0, 0)), constant_values=-1)
        rows = jnp.where(a_col >= 0, jnp.clip(a_col, 0, k - 1), k)
        return wide[rows.reshape(-1)]

    out["wide_gather"] = profiling.device_time_ms(gather_only, ac, ac, av)
    print("wide_gather", out["wide_gather"]["device_ms"], flush=True)

    g = jax.block_until_ready(gather_only(ac, ac, av))

    # stage B: the select/mul/pad pass alone on a materialized g
    @jax.jit
    def select_pass(g, a_val):
        g3 = g.reshape(m, ka, g.shape[1])
        parity = (jax.lax.broadcasted_iota(jnp.int32, (1, ka, 1), 1)
                  & 1) == 1
        bc = jnp.where(parity, g3[:, :, 2 * run:3 * run], g3[:, :, :run])
        bvb = jnp.where(parity, g3[:, :, 3 * run:4 * run],
                        g3[:, :, run:2 * run])
        bv = jax.lax.bitcast_convert_type(bvb, jnp.float32)
        valid = bc >= 0
        key = jnp.where(valid, bc, bitonic.SENTINEL).reshape(m, ka * run)
        val = jnp.where(valid, a_val[:, :, None] * bv, 0.0
                        ).reshape(m, ka * run)
        pad = plan.width - ka * run
        key = jnp.pad(key, ((0, 0), (0, pad)),
                      constant_values=bitonic.SENTINEL)
        val = jnp.pad(val, ((0, 0), (0, pad)))
        return key, val

    out["select_pass"] = profiling.device_time_ms(select_pass, g, av)
    print("select_pass", out["select_pass"]["device_ms"], flush=True)

    # full expand_wide
    ew = functools.partial(bitonic._expand_ell_wide, ac, av, ac, av,
                           width=plan.width, run=run, chunks=plan.chunks)
    out["expand_wide"] = profiling.device_time_ms(ew)
    print("expand_wide", out["expand_wide"]["device_ms"], flush=True)

    key, val = jax.block_until_ready(ew())

    # sort+compress from ROW-major (in-VMEM transpose_in)
    sc_rowin = functools.partial(
        bitonic._sort_compress_cols, key, val, width=plan.width,
        start_kk=2 * plan.run, interpret=False, static_strides=True,
        pre_transposed=False)
    out["sc_transpose_in"] = profiling.device_time_ms(sc_rowin)
    print("sc_transpose_in", out["sc_transpose_in"]["device_ms"], flush=True)

    # sort+compress from pre-transposed (XLA .T first, then kernel)
    keyT = jax.block_until_ready(jax.jit(lambda x: x.T + 0)(key))
    valT = jax.block_until_ready(jax.jit(lambda x: x.T + 0.0)(val))
    sc_pre = functools.partial(
        bitonic._sort_compress_cols, keyT, valT, width=plan.width,
        start_kk=2 * plan.run, interpret=False, static_strides=True,
        pre_transposed=True)
    out["sc_pre_transposed"] = profiling.device_time_ms(sc_pre)
    print("sc_pre_transposed", out["sc_pre_transposed"]["device_ms"], flush=True)

    # XLA transpose of the row-major pair (clean arrays)
    tp = jax.jit(lambda a_, b_: (a_.T + 0, b_.T + 0.0))
    out["xla_transpose_rowmajor_pair"] = profiling.device_time_ms(
        tp, key, val)

    print(json.dumps({k2: round(v["device_ms"], 3)
                      for k2, v in out.items()}, indent=2))


if __name__ == "__main__":
    main()
