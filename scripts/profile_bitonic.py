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

    use_cols = plan.width <= bitonic.TRANSPOSED_MAX_WIDTH

    expand = functools.partial(
        bitonic._expand_ell, A_ell.col_ind, A_ell.values,
        A_ell.col_ind, A_ell.values, width=plan.width, run=plan.run,
        transpose_out=use_cols, chunks=plan.chunks)
    out["expand"] = profiling.device_time_ms(expand)

    key, val = expand()
    key, val = jax.block_until_ready((key, val))

    sc = functools.partial(
        bitonic._sort_compress_cols, key, val, width=plan.width,
        start_kk=2 * plan.run, interpret=False,
        static_strides=plan.width <= bitonic.STATIC_STRIDE_MAX_WIDTH,
        pre_transposed=True)
    out["sort_compress"] = profiling.device_time_ms(sc)

    # epilogue = the XLA transposes back to row-major: time sc minus a
    # variant returning the transposed views unsummed is awkward; instead
    # time a standalone transpose of the same footprint
    t_fn = jax.jit(lambda k, v: (k.T + 0, v.T + 0.0))
    out["transpose_pair"] = profiling.device_time_ms(t_fn, key, val)

    full = functools.partial(bitonic.spgemm_bitonic, A_ell, A_ell, plan)
    out["full"] = profiling.device_time_ms(full)

    C = jax.block_until_ready(full())
    out["checksum"] = profiling.device_time_ms(
        lambda: C.checksum())
    out["nnz_out"] = int(C.nnz)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
