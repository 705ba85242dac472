"""Per-stage DEVICE-time breakdown of the flagship bitonic pipeline on the
headline workload. Prints one JSON dict; run on the real TPU.

Stages:
  expand        _expand_ell (row-gather + outer-multiply, transposed out)
  sort          Pallas sort kernel (or fused sort+compress)
  compress      Pallas compress kernel
  epilogue      the output transposes (width, m) -> (m, width)
  full          whole spgemm_bitonic
  checksum      ELL.checksum() on the result

Usage: python scripts/profile_bitonic.py [m]
"""

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
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    a = build_matrix(m=m)
    A = CSR.from_scipy(a.astype(np.float32))
    A_ell = convert.csr_to_ell(A, check_guard=False)
    plan = bitonic.plan_bitonic(A_ell, A_ell)
    out = {"m": m, "nnz": int(A.nnz), "plan": {
        "width": plan.width, "run": plan.run, "chunks": plan.chunks,
        "ka": int(A_ell.col_ind.shape[1])}}

    ka_eff = A_ell.col_ind.shape[1] * plan.chunks
    expand_g = functools.partial(
        bitonic._expand_gather_emajor, A_ell.col_ind, A_ell.values,
        A_ell.col_ind, A_ell.values, run=plan.run, chunks=plan.chunks)
    out["expand_gather"] = profiling.device_time_ms(expand_g)
    print("expand_gather", out["expand_gather"]["device_ms"], flush=True)

    g, avT = jax.block_until_ready(expand_g())

    sc = functools.partial(
        bitonic._sort_compress_from_gather, g, avT, width=plan.width,
        run=plan.run, ka=ka_eff, start_kk=2 * plan.run, interpret=False,
        static_strides=plan.width <= bitonic.STATIC_STRIDE_MAX_WIDTH)
    out["fused_sort_compress"] = profiling.device_time_ms(sc)
    print("fused_sort_compress", out["fused_sort_compress"]["device_ms"],
          flush=True)

    sc512 = functools.partial(
        bitonic._sort_compress_from_gather, g, avT, width=plan.width,
        run=plan.run, ka=ka_eff, start_kk=2 * plan.run, interpret=False,
        static_strides=plan.width <= bitonic.STATIC_STRIDE_MAX_WIDTH,
        out_width=512)
    out["fused_sc_outw512"] = profiling.device_time_ms(sc512)
    print("fused_sc_outw512", out["fused_sc_outw512"]["device_ms"],
          flush=True)

    full = functools.partial(bitonic.spgemm_bitonic, A_ell, A_ell, plan)
    out["full"] = profiling.device_time_ms(full)
    print("full", out["full"]["device_ms"], flush=True)

    full512 = functools.partial(bitonic.spgemm_bitonic, A_ell, A_ell,
                                plan, out_width=512)
    out["full_outw512"] = profiling.device_time_ms(full512)

    C = jax.block_until_ready(full())
    out["checksum"] = profiling.device_time_ms(
        lambda: C.checksum())
    out["nnz_out"] = int(C.nnz)
    out["max_row_nnz"] = int(np.max(np.asarray(C.nnz_row)))

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
