"""Authoritative op-level device profile of the headline routes via an
xplane trace (jax.profiler.ProfileData) — the hand-rolled stage timers in
x_mc_profile measured jit-CONSTANT-captured closures, which XLA lays out
differently from the shipped argument-passing pipeline (measured 10.9 vs
1.8 ms for the identical gather, reports/tablegather_probe.json).

Traces ONE steady-state call of
  flat      spgemm_bitonic (the shipping bench headline route)
  mc_bcsr   multiclass_planned(assemble='bcsr')  host-planned
  mc_ell    multiclass_planned(assemble='ell', out_width=cap)
and prints every device op >= 1% of the call, grouped by fusion name.

Writes reports/mc_trace.json.
"""

import json
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def device_ops(trace_dir):
    """Sum per-op durations on the device plane of the newest xplane."""
    from jax.profiler import ProfileData
    paths = []
    for root, _dirs, files in os.walk(trace_dir):
        paths += [os.path.join(root, f) for f in files
                  if f.endswith(".xplane.pb")]
    assert paths, f"no xplane under {trace_dir}"
    pd = ProfileData.from_file(max(paths, key=os.path.getmtime))
    ops = {}
    for plane in pd.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                d = ev.duration_ns
                if d <= 0:
                    continue
                ops[ev.name] = ops.get(ev.name, 0) + d
    return ops


def profile_call(tag, fn, out):
    import jax
    fn()  # compile + warm
    jax.block_until_ready(fn())
    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        jax.block_until_ready(fn())
        jax.profiler.stop_trace()
        ops = device_ops(td)
    total = sum(ops.values())
    rows = sorted(ops.items(), key=lambda kv: -kv[1])
    print(f"\n=== {tag}: device total {total / 1e6:.3f} ms ===",
          flush=True)
    kept = []
    for name, ns in rows:
        pct = 100.0 * ns / max(total, 1)
        if pct < 1.0:
            continue
        short = re.sub(r"\d{3,}", "#", name)[:90]
        print(f"  {ns / 1e6:8.3f} ms  {pct:5.1f}%  {short}", flush=True)
        kept.append({"op": name[:160], "ms": round(ns / 1e6, 3),
                     "pct": round(pct, 1)})
    out[tag] = {"device_total_ms": round(total / 1e6, 3), "ops": kept}


def main():
    import jax

    import bench as hb
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import bitonic

    enable_compilation_cache()
    smoke = os.environ.get("IA_SPGEMM_BENCH_SMOKE") == "1"
    a = hb.build_matrix(m=256 if smoke else 32768).astype(np.float32)
    A = CSR.from_scipy(a)
    A_ell = convert.csr_to_ell(A, check_guard=False)
    out = {}

    bplan = bitonic.plan_bitonic(A_ell, A_ell)
    if bplan.viable:
        profile_call("flat",
                     lambda: bitonic.spgemm_bitonic(A_ell, A_ell, bplan),
                     out)

    call_b = bitonic.multiclass_planned(A_ell, A_ell, assemble="bcsr")
    if call_b is not None:
        profile_call("mc_bcsr", call_b, out)
    # the harness's headline cap: observed max output row, pow2
    C = call_b() if call_b is not None else None
    if C is not None:
        mx = int(np.max(np.asarray(C.nnz_row)))
        ow = 128
        while ow < mx:
            ow *= 2
        call_e = bitonic.multiclass_planned(A_ell, A_ell, assemble="ell",
                                            out_width=ow)
        if call_e is not None:
            profile_call("mc_ell", call_e, out)

    os.makedirs("reports", exist_ok=True)
    tag = "_smoke" if smoke else ""
    with open(f"reports/mc_trace{tag}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote reports/mc_trace{tag}.json", flush=True)


if __name__ == "__main__":
    main()
