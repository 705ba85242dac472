"""On-chip isolation of the multiclass ASSEMBLY cost on the headline.

NOTES round-4 'open levers': the class kernels sum to ~7.3 ms in
isolation while mc_bcsr runs 9.7 e2e — is the ~2.4 ms gap really the
bcsr assembly (concat + block gather + nnz glue), or dispatch overhead?
Measures e2e device time of the SAME planned pipeline under
assemble='raw' (class outputs only), 'bcsr' and 'ell'; the raw->bcsr
delta is the assembly's true in-pipeline cost. Writes
reports/asm_probe.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    import bench as hb
    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic

    enable_compilation_cache()
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    a = hb.build_matrix(m=256 if smoke else 32768)
    A = CSR.from_scipy(a.astype(np.float32))
    A_ell = convert.csr_to_ell(A, check_guard=False)
    ref_sum = float((a @ a).sum())
    out = {}
    for mode in ("raw", "bcsr", "ell"):
        t0 = time.perf_counter()
        call = bitonic.multiclass_planned(A_ell, A_ell, assemble=mode)
        plan_s = time.perf_counter() - t0
        if call is None:
            out[mode] = {"viable": False}
            continue
        C = jax.block_until_ready(call())
        d = profiling.device_time_ms(call, chain=8)
        rel = None
        if mode != "raw":
            rel = abs(float(C.checksum()) - ref_sum) / max(1.0, abs(ref_sum))
        out[mode] = {"device_ms": round(d["device_ms"], 3),
                     "single_ms": round(d["single_ms"], 1),
                     "plan_s": round(plan_s, 2), "rel_err": rel}
        print(mode, out[mode], flush=True)
    if "raw" in out and "bcsr" in out and "device_ms" in out.get("raw", {}):
        out["bcsr_minus_raw_ms"] = round(
            out["bcsr"]["device_ms"] - out["raw"]["device_ms"], 3)
        out["ell_minus_raw_ms"] = round(
            out["ell"]["device_ms"] - out["raw"]["device_ms"], 3)
    os.makedirs("reports", exist_ok=True)
    tag = "_smoke" if smoke else ""
    with open(f"reports/asm_probe{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/asm_probe{tag}.json", flush=True)


if __name__ == "__main__":
    main()
