"""Tracing/profiling helpers (SURVEY.md §5: the reference's only tracing
is wall-clock timers, detail/utime.h; the TPU equivalent is jax.profiler
traces plus the per-kernel roofline in bench/roofline.py).

Usage:
    with trace("/tmp/ia_spgemm_trace"):
        C = spgemm_bitonic(A, B)
        jax.block_until_ready(C.values)
    # open the trace in TensorBoard / xprof, or use annotate() to mark
    # pipeline phases inside a jitted region.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: writes an xplane trace to log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up inside profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def time_op(fn: Callable, *args, iters: int = 5, warmup: int = 1,
            **kwargs) -> Dict:
    """Median wall-clock of fn(*args) with device sync, plus spread.

    The reference times with gettimeofday around each kernel
    (main.cpp:715-749); this is the same measurement with
    block_until_ready standing in for kernel completion.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        ts.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(ts)
    return {"median_ms": float(np.median(arr)),
            "min_ms": float(arr.min()), "max_ms": float(arr.max()),
            "iters": iters}
