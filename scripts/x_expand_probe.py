"""Scratch probe: where does expand time go, and what does a Pallas
transpose cost vs XLA's? Run on the real TPU."""

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    out = {}

    ac, av = A_ell.col_ind, A_ell.values
    m, ka = ac.shape
    k, kb = ac.shape[0], ac.shape[1]

    # 1. raw gather only: (m*ka) indices from the packed (2k, 2*run) table
    run = plan.run
    bc_p = jnp.pad(ac, ((0, 0), (0, run - kb)), constant_values=-1)
    bv_p = jnp.pad(av, ((0, 0), (0, run - kb)))
    fwd = jnp.concatenate(
        [bc_p, jax.lax.bitcast_convert_type(bv_p, jnp.int32)], axis=1)
    table = jnp.concatenate([fwd, fwd], axis=0)
    rows_idx = jnp.clip(ac, 0, k - 1).reshape(-1)

    @jax.jit
    def raw_gather(t, r):
        return t[r]

    out["raw_gather_950k"] = profiling.device_time_ms(raw_gather, table,
                                                      rows_idx)

    # 1b. same data volume, half the indices (valid-ish count) — each
    # index pulls a 128-lane row (2 B-rows packed)
    table2 = table.reshape(k, -1)
    rows2 = rows_idx[: (m * ka) // 2] // 2

    @jax.jit
    def raw_gather_half(t, r):
        return t[r]

    out["raw_gather_475k_wide"] = profiling.device_time_ms(
        raw_gather_half, table2, rows2)

    # 2. expand row-major vs transposed
    ex_row = functools.partial(bitonic._expand_ell, ac, av, ac, av,
                               width=plan.width, run=plan.run,
                               transpose_out=False, chunks=plan.chunks)
    out["expand_rowmajor"] = profiling.device_time_ms(ex_row)
    ex_t = functools.partial(bitonic._expand_ell, ac, av, ac, av,
                             width=plan.width, run=plan.run,
                             transpose_out=True, chunks=plan.chunks)
    out["expand_transposed"] = profiling.device_time_ms(ex_t)

    # 3. transposes of the (width, m) pair: XLA vs Pallas tiled
    key = jnp.zeros((plan.width, m), jnp.int32)
    val = jnp.zeros((plan.width, m), jnp.float32)

    xla_t = jax.jit(lambda a_, b_: (a_.T + 0, b_.T + 0.0))
    out["xla_transpose_pair"] = profiling.device_time_ms(xla_t, key, val)

    def _tkern(a_ref, b_ref, oa_ref, ob_ref):
        oa_ref[:] = a_ref[:].T
        ob_ref[:] = b_ref[:].T

    TL = 512

    @jax.jit
    def pallas_t(a_, b_):
        return pl.pallas_call(
            _tkern,
            grid=(m // TL, plan.width // TL),
            in_specs=[pl.BlockSpec((TL, TL), lambda i, j: (j, i),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec((TL, TL), lambda i, j: (i, j),
                                    memory_space=pltpu.VMEM),) * 2,
            out_shape=(jax.ShapeDtypeStruct((m, plan.width), jnp.int32),
                       jax.ShapeDtypeStruct((m, plan.width), jnp.float32)),
        )(a_, b_)

    out["pallas_transpose_pair"] = profiling.device_time_ms(
        pallas_t, key, val)

    # 4. plain bandwidth reference: copy the pair
    cp = jax.jit(lambda a_, b_: (a_ + 0, b_ + 0.0))
    out["copy_pair"] = profiling.device_time_ms(cp, key, val)

    print(json.dumps({k2: round(v["device_ms"], 3) if isinstance(v, dict)
                      else v for k2, v in out.items()}, indent=2))


if __name__ == "__main__":
    main()
