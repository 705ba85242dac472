"""A/B the pregather route's remaining knobs on the headline.

With pregather the per-call cost is pure kernel work, so knobs that
were gather-bound lose their old penalty:
- run_override=8: finer fragment padding (~25% fewer sort slots) at
  +1 merge stage set and 32-lane table rows — the 32-lane gather that
  sank run=8 in round 3 now happens once at plan time;
- fused width 256 vs 512 vs 1024 for the fused expand+sort+compress.

Writes reports/pg_tune.json.
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
    out = {"fused_max_width": bitonic.FUSED_MAX_WIDTH}
    # smoke: run=8 in interpret mode multiplies kernel variants past the
    # CPU crash-check budget; the knob is chip-specific anyway
    for run in ((None, 16) if smoke else (None, 8, 16)):
        tag = f"pg_run{run or 'auto'}"
        t0 = time.perf_counter()
        call = bitonic.multiclass_planned(A_ell, A_ell, assemble="bcsr",
                                          pregather=True,
                                          run_override=run)
        plan_s = time.perf_counter() - t0
        if call is None:
            out[tag] = {"viable": False}
            print(tag, out[tag], flush=True)
            continue
        C = profiling.force(call())
        d = profiling.device_time_ms(call, chain=8)
        rel = abs(float(C.checksum()) - ref_sum) / max(1.0, abs(ref_sum))
        out[tag] = {"device_ms": round(d["device_ms"], 3),
                    "plan_s": round(plan_s, 2), "rel_err": rel,
                    "nnz": int(np.asarray(C.nnz))}
        print(tag, out[tag], flush=True)

    os.makedirs("reports", exist_ok=True)
    sfx = "_smoke" if smoke else ""
    with open(f"reports/pg_tune{sfx}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/pg_tune{sfx}.json", flush=True)


if __name__ == "__main__":
    main()
