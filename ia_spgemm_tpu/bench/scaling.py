"""nnz/s scaling measurement for the distributed SpGEMM paths.

BASELINE.md's north star asks for nnz/s measured at 1 chip / 1 host /
N>=2 hosts with >=70% scaling efficiency. On a multi-chip slice this
module measures the real thing; on a single chip (or the virtual CPU
mesh) it still exercises the full sharded program — XLA compiles the same
collectives — and reports per-device-count throughput with the honest
`simulated` flag so results are never mistaken for pod numbers.

Scaling protocol (weak or strong):
  strong: fixed global problem, split over D devices;
  weak:   per-device rows held constant, global problem grows with D.
Efficiency(D) = throughput(D) / (D * throughput(1)).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Sequence

import jax
import numpy as np

from ia_spgemm_tpu.formats import convert
from ia_spgemm_tpu.formats.types import CSR
from ia_spgemm_tpu.ops.flops import get_flop
from ia_spgemm_tpu.parallel import ring
from ia_spgemm_tpu.parallel.mesh import make_mesh


@dataclasses.dataclass
class ScalingPoint:
    devices: int
    nnz_out: int
    flops: int
    time_ms: float
    nnz_per_s: float
    gflops: float
    efficiency: float  # vs. linear scaling from the 1-device point


def _time_ms(fn, iters: int = 3) -> float:
    jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def measure_ring_scaling(A: CSR, device_counts: Sequence[int] = (1, 2, 4, 8),
                         iters: int = 3) -> List[ScalingPoint]:
    """Strong scaling of ring_spgemm C = A @ A over growing meshes."""
    n_avail = len(jax.devices())
    flops = get_flop(A, A)
    A_ell = convert.csr_to_ell(A, check_guard=False)
    points: List[ScalingPoint] = []
    base = None
    for d in device_counts:
        if d > n_avail:
            break
        mesh = make_mesh(d)
        As = ring.partition_rows_ell(A_ell, d, mesh=mesh)
        plan = ring.plan_ring(A_ell, A_ell, d)
        if not plan.viable:
            break

        def run():
            return ring.ring_spgemm(As, As, mesh, plan)

        ms = _time_ms(run, iters)
        C = run()
        nnz_out = int(np.asarray(C.nnz_row).sum())
        nnz_per_s = nnz_out / (ms / 1e3)
        if base is None:
            base = nnz_per_s
        eff = nnz_per_s / (d * base) if base else 0.0
        points.append(ScalingPoint(
            devices=d, nnz_out=nnz_out, flops=flops, time_ms=round(ms, 3),
            nnz_per_s=round(nnz_per_s, 1),
            gflops=round(2.0 * flops / (ms * 1e6), 4),
            efficiency=round(eff, 4)))
    return points


def report(points: List[ScalingPoint], simulated: bool | None = None) -> dict:
    if simulated is None:
        simulated = jax.default_backend() != "tpu"
    return {
        "metric": "ring_spgemm_scaling",
        "simulated": simulated,
        "backend": jax.default_backend(),
        "points": [dataclasses.asdict(p) for p in points],
    }


def main():
    import json
    import sys

    if "--cpu" in sys.argv:
        # the image's sitecustomize pins JAX_PLATFORMS=axon; env vars are
        # too late, but config updates before backend init still work
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    from bench import build_matrix
    from ia_spgemm_tpu.cli.main import enable_compilation_cache
    enable_compilation_cache()
    a = build_matrix(m=8192, band=4, extra_per_row=8)
    A = CSR.from_scipy(a.astype(np.float32))
    pts = measure_ring_scaling(A)
    print(json.dumps(report(pts)))


if __name__ == "__main__":
    main()
