"""Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled, so fp64 parity vs the SciPy oracle is exact and multi-chip
sharding is exercised without TPU hardware.

Note: this image's sitecustomize pre-imports jax and registers the TPU
backend at interpreter start, so env vars are too late — we must use
jax.config.update here, before any backend touch."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import os  # noqa: E402

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
