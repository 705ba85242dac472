"""Scratch probe: fully-fused expand+sort+compress at width 1024 under
the raised VMEM cap, and a 256-lane tile variant."""

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

    from bench import build_matrix
    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic

    mode = sys.argv[1] if len(sys.argv) > 1 else "fuse1024"
    if mode == "fuse1024":
        bitonic.FUSED_MAX_WIDTH = 1024
    elif mode == "lanes256":
        bitonic._TILE_LANES = 256
    elif mode == "fuse1024_lanes256":
        bitonic.FUSED_MAX_WIDTH = 1024
        bitonic._TILE_LANES = 256
        bitonic._FUSED_VMEM_LIMIT = 110 * 1024 * 1024

    enable_compilation_cache()
    a = build_matrix()
    A = CSR.from_scipy(a.astype(np.float32))
    A_ell = convert.csr_to_ell(A, check_guard=False)
    plan = bitonic.plan_bitonic(A_ell, A_ell)
    ka_eff = A_ell.col_ind.shape[1] * plan.chunks

    g, avT = jax.block_until_ready(bitonic._expand_gather_emajor(
        A_ell.col_ind, A_ell.values, A_ell.col_ind, A_ell.values,
        run=plan.run, chunks=plan.chunks))

    out = {"mode": mode}
    for outw in (None, 512):
        sc = functools.partial(
            bitonic._sort_compress_from_gather, g, avT, width=plan.width,
            run=plan.run, ka=ka_eff, start_kk=2 * plan.run,
            interpret=False, static_strides=True, out_width=outw)
        r = profiling.device_time_ms(sc)
        out[f"sc_outw_{outw}"] = round(r["device_ms"], 3)
        print(f"sc_outw_{outw}", out[f"sc_outw_{outw}"], flush=True)
    # correctness spot check: checksum of compacted result
    col, val, nnz = jax.block_until_ready(
        bitonic._sort_compress_from_gather(
            g, avT, width=plan.width, run=plan.run, ka=ka_eff,
            start_kk=2 * plan.run, interpret=False, static_strides=True))
    import jax.numpy as jnp
    out["checksum"] = float(jnp.sum(val))
    out["nnz"] = int(jnp.sum(nnz))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
