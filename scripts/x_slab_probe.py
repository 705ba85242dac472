"""On-chip probe of the slab-packed ESC engine (ops/slab.py): device
time + checksum on the headline and heavy-skew workloads, A/B over
(width, run). Writes reports/slab_probe.json."""

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


def main():
    import jax

    import bench as hb
    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import slab

    enable_compilation_cache()
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    out = {}

    workloads = {
        "headline": hb.build_matrix(m=256 if smoke else 32768),
        "skew": build_skew(smoke=smoke),
    }
    for wname, a in workloads.items():
        a = a.astype(np.float32)
        A = CSR.from_scipy(a)
        want = (a @ a).tocsr()
        want.sum_duplicates()
        wsum = float(want.sum())
        for width in (None, 512, 1024):
            for run in (None, 16):
                tag = f"{wname}_w{width or 'auto'}_r{run or 'auto'}"
                t0 = time.perf_counter()
                call = slab.plan_slab_csr(A, A, width=width, run=run)
                plan_s = time.perf_counter() - t0
                if call is None:
                    out[tag] = {"viable": False}
                    print(tag, out[tag], flush=True)
                    continue
                p = call.plan
                try:
                    C = jax.block_until_ready(call())
                except Exception as e:  # noqa: BLE001 — record, keep probing
                    out[tag] = {"viable": True,
                                "error": f"{type(e).__name__}: {e}"[:300]}
                    print(tag, out[tag], flush=True)
                    continue
                d = profiling.device_time_ms(lambda: call(), chain=2)
                rel = abs(float(C.checksum()) - wsum) / max(1.0, abs(wsum))
                out[tag] = {
                    "viable": True,
                    "device_ms": round(d["device_ms"], 3),
                    "plan_s": round(plan_s, 2),
                    "width": p.width, "run": p.run,
                    "n_slabs": p.n_slabs,
                    "padded_slots": p.padded_slots,
                    "true_flops": p.true_flops,
                    "nnz": int(np.asarray(C.nnz)),
                    "nnz_want": int(want.nnz),
                    "checksum_rel_err": rel,
                }
                print(tag, out[tag], flush=True)

    os.makedirs("reports", exist_ok=True)
    tag = "_smoke" if smoke else ""
    with open(f"reports/slab_probe{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/slab_probe{tag}.json", flush=True)


if __name__ == "__main__":
    main()
