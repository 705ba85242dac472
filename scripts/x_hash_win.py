"""Probe the hash route's candidate winning regime on-chip.

VERDICT r3 #8: hash needs a workload where it wins, or a measured
bound. The one regime where scalar SMEM probing can amortize on TPU:
per-row intermediate products exceed the sort engines' width cap
(bitonic/multiclass/slab all inviable at padded products > MAX_WIDTH)
while the OUTPUT stays narrow (massive duplicate collapse into few
columns), so the ESC fallback pays a global sort over E elements that
the hash table collapses on the fly in O(E) probes.

Workload: A (m x k) with 160-entry rows, B (k x n) with 128-entry rows
into only n=1024 columns -> per-row padded products 160*128 = 20480 >
16384 (sort engines inviable), E = m*20k true products, C rows <= 1024
(~20x collapse). Times hash vs the forced-ESC fallback vs scipy.
Writes reports/hash_win.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build(m, k, n, a_len, b_len, seed=5):
    import scipy.sparse as sp
    rng = np.random.default_rng(seed)
    ac = np.stack([rng.choice(k, a_len, replace=False) for _ in range(m)])
    a = sp.csr_matrix((rng.standard_normal(m * a_len).astype(np.float32),
                       ac.reshape(-1),
                       np.arange(m + 1) * a_len), shape=(m, k))
    bc = np.stack([rng.choice(n, b_len, replace=False) for _ in range(k)])
    b = sp.csr_matrix((rng.standard_normal(k * b_len).astype(np.float32),
                       bc.reshape(-1),
                       np.arange(k + 1) * b_len), shape=(k, n))
    a.sort_indices()
    b.sort_indices()
    return a, b


def main():
    import jax

    from ia_spgemm_tpu.bench import profiling
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic, esc, hash_spgemm, slab

    enable_compilation_cache()
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    if smoke:
        m, k, n, a_len, b_len = 64, 64, 64, 24, 20
    else:
        m, k, n, a_len, b_len = 4096, 4096, 1024, 160, 128
    a, b = build(m, k, n, a_len, b_len)
    A, B = CSR.from_scipy(a), CSR.from_scipy(b)
    A_ell = convert.csr_to_ell(A, check_guard=False)
    B_ell = convert.csr_to_ell(B, check_guard=False)
    t0 = time.perf_counter()
    want = (a @ b).tocsr()
    scipy_s = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        a @ b
        scipy_s = min(scipy_s, time.perf_counter() - t0)
    wsum = float(want.sum())
    out = {"m": m, "k": k, "n": n,
           "E": int(m * a_len * b_len), "nnz_out": int(want.nnz),
           "collapse": round(m * a_len * b_len / max(want.nnz, 1), 2),
           "scipy_ms": round(scipy_s * 1e3, 1)}

    # sort engines must be inviable here (the regime's defining feature)
    bt = bitonic.plan_bitonic(A_ell, B_ell)
    mc, _ = bitonic.plan_multiclass(np.asarray(A_ell.nnz_row),
                                    B_ell.max_nnz_per_row)
    sl = slab.plan_slab_csr(A, B)
    out["sort_engines_viable"] = {"flat": bool(bt.viable),
                                  "multiclass": bool(mc.viable),
                                  "slab": sl is not None}

    def run(tag, fn):
        try:
            C = jax.block_until_ready(fn())
        except Exception as e:  # noqa: BLE001 — record and keep probing
            out[tag] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(tag, out[tag], flush=True)
            return
        d = profiling.device_time_ms(fn, chain=4)
        rel = abs(float(C.checksum()) - wsum) / max(1.0, abs(wsum))
        out[tag] = {"device_ms": round(d["device_ms"], 2),
                    "single_ms": round(d["single_ms"], 1),
                    "rel_err": rel, "nnz": int(np.asarray(C.nnz))}
        print(tag, out[tag], flush=True)

    run("hash", lambda: hash_spgemm.spgemm_hash(A_ell, B_ell))
    ep = esc.plan_spgemm(A, B)
    run("esc_global", lambda: esc.spgemm_csr(A, B, ep, engine="global"))

    os.makedirs("reports", exist_ok=True)
    tag = "_smoke" if smoke else ""
    with open(f"reports/hash_win{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote reports/hash_win{tag}.json", flush=True)


if __name__ == "__main__":
    main()
