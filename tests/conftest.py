"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled, so fp64 parity vs the SciPy oracle is exact and multi-chip
sharding is exercised without TPU hardware.

Note: this image's sitecustomize pre-imports jax and registers the TPU
backend at interpreter start, so env vars are too late — we must use
jax.config.update here, before any backend touch."""

import os

import jax

if os.environ.get("IA_SPGEMM_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)
# IA_SPGEMM_TEST_TPU=1 keeps the real TPU backend (fp32, 1 device):
# kernels then run compiled instead of interpreted — this catches
# TPU-only miscompiles (e.g. the fused gather+flip wipe) that the
# interpreter cannot. Distributed/fp64 tests skip themselves.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_INPUTS = "/root/reference/IA-SPGEMM-CPU_release/Inputs"


def reference_input_paths():
    if not os.path.isdir(REFERENCE_INPUTS):
        return []
    return sorted(
        os.path.join(REFERENCE_INPUTS, f)
        for f in os.listdir(REFERENCE_INPUTS) if f.endswith(".mtx"))


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def fp_tol() -> float:
    """Relative tolerance matched to the active compute precision: 1e-12
    under the fp64 CPU oracle config, 1e-5 on the f32-only TPU backend."""
    return 1e-12 if jax.config.jax_enable_x64 else 1e-5
