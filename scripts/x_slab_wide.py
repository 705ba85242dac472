"""Does the cols-layout slab sort compile/run at widths past
TRANSPOSED_MAX_WIDTH (1024) with loop-carried strides? r2 notes say the
ragged class path OOM'd scoped VMEM at 2048, but that predates the
raised _FUSED_VMEM_LIMIT and the ka_blocks gather split. If 2048-8192
work, SLAB_MAX_WIDTH rises and the skew workload gets slab coverage.
Writes reports/slab_wide.json."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax

    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import slab
    from scripts.x_slab_probe import build_skew

    enable_compilation_cache()
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    import bench as hb
    workloads = {
        # headline forced wider: pure width-scaling compile/perf probe
        "headline": (hb.build_matrix(m=256 if smoke else 32768),
                     (2048, 4096, 8192)),
        # skew NEEDS 16384 (heavy rows pad to ~12.8k products at run 32)
        "skew": (build_skew(smoke=smoke), (16384,)),
    }
    out = {}
    old_cap = slab.SLAB_MAX_WIDTH
    try:
        slab.SLAB_MAX_WIDTH = 16384
        for wname, (a, widths) in workloads.items():
            a = a.astype(np.float32)
            A = CSR.from_scipy(a)
            want = (a @ a).tocsr()
            want.sum_duplicates()
            wsum = float(want.sum())
            probe_list = [(w, r) for w in widths for r in (32, 16)]
            for width, run in probe_list:
                tag = f"{wname}_w{width}_r{run}"
                slab.clear_plan_cache()
                t0 = time.perf_counter()
                call = slab.plan_slab_csr(A, A, width=width, run=run)
                plan_s = time.perf_counter() - t0
                if call is None:
                    out[tag] = {"viable": False}
                    print(tag, out[tag], flush=True)
                    continue
                try:
                    C = jax.block_until_ready(call())
                    d = profiling.device_time_ms(lambda: call(), chain=2)
                    rel = abs(float(C.checksum()) - wsum) \
                        / max(1.0, abs(wsum))
                    out[tag] = {
                        "viable": True,
                        "device_ms": round(d["device_ms"], 3),
                        "plan_s": round(plan_s, 2),
                        "n_slabs": call.plan.n_slabs,
                        "padded_slots": call.plan.padded_slots,
                        "nnz": int(np.asarray(C.nnz)),
                        "checksum_rel_err": rel,
                    }
                except Exception as e:  # noqa: BLE001
                    out[tag] = {"viable": True,
                                "error": f"{type(e).__name__}: {e}"[:250]}
                print(tag, out[tag], flush=True)
    finally:
        slab.SLAB_MAX_WIDTH = old_cap

    os.makedirs("reports", exist_ok=True)
    suffix = "_smoke" if smoke else ""
    with open(f"reports/slab_wide{suffix}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/slab_wide{suffix}.json", flush=True)


if __name__ == "__main__":
    main()
