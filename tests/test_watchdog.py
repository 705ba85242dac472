"""Process-isolated watchdog: a timed-out algorithm must actually STOP
(reference: pthread_cancel, main.cpp:770-793) and must not poison the
timing of whatever runs next (the round-1 thread watchdog's failure
mode)."""

from __future__ import annotations

import time

import numpy as np
import pytest
import scipy.sparse as sp

from ia_spgemm_tpu.bench.isolated import (
    STARTUP_GRACE_S,
    bench_algorithm_isolated,
)
from ia_spgemm_tpu.formats.types import CSR


def _small_matrix():
    rng = np.random.default_rng(0)
    a = sp.random(64, 64, density=0.05, random_state=rng,
                  dtype=np.float64, format="csr")
    a.sum_duplicates()
    return CSR.from_scipy(a)


@pytest.mark.parametrize("alg", ["csr"])
def test_isolated_runs_and_reports(alg):
    A = _small_matrix()
    res = bench_algorithm_isolated(A, A, alg, timeout_s=None, iters=2,
                                   backend="cpu")
    assert res.error == ""
    assert res.ok
    want = float((A.to_scipy() @ A.to_scipy()).sum())
    assert abs(res.verified_sum - want) < 1e-9 * max(1.0, abs(want))
    assert res.run_time_ms > 0


def test_timeout_kills_and_next_algorithm_unaffected(monkeypatch):
    """The kill test: a never-finishing candidate times out, and the NEXT
    isolated run's measured time is normal (the worker died with its
    process group; nothing is left occupying the backend)."""
    import ia_spgemm_tpu.bench.isolated as iso

    A = _small_matrix()
    # tighten the startup grace so the test doesn't wait minutes
    monkeypatch.setattr(iso, "STARTUP_GRACE_S", 3.0)
    t0 = time.perf_counter()
    res = bench_algorithm_isolated(A, A, "_test_slow", timeout_s=1.0,
                                   iters=1, backend="cpu")
    elapsed = time.perf_counter() - t0
    assert res.timed_out
    assert res.run_time_ms == 0.0  # reported zeroed, main.cpp:778-793
    assert elapsed < 60.0

    # the next algorithm must measure clean
    res2 = bench_algorithm_isolated(A, A, "csr", timeout_s=None, iters=2,
                                    backend="cpu")
    assert res2.ok and res2.error == ""
    # a poisoned backend would show up as a wildly inflated runtime; a
    # 64x64 CSR multiply on CPU is milliseconds even cold
    assert res2.run_time_ms < 10_000.0


def test_grace_constant_sane():
    assert STARTUP_GRACE_S >= 60.0
