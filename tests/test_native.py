"""Native C++ .mtx parser: builds from source and matches the Python reader
bit-for-bit, including on a large generated file."""

import numpy as np
import pytest

from ia_spgemm_tpu.io import mmio, native
from tests import fixtures
from tests.conftest import reference_input_paths


@pytest.fixture(scope="module")
def lib():
    if not native.available() and not native.build():
        pytest.skip("no C++ toolchain")
    return True


@pytest.mark.parametrize("kind", fixtures.ALL_KINDS)
def test_native_matches_python(lib, tmp_path, kind):
    path = fixtures.mtx_file(tmp_path, kind)
    h1, r1, c1, v1 = native.read_mtx(path)
    h2, r2, c2, v2 = mmio.read_mtx(path)
    assert h1 == h2
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(v1, v2)


@pytest.mark.parametrize("path", reference_input_paths())
def test_native_on_reference_inputs(lib, path):
    h1, r1, c1, v1 = native.read_mtx(path)
    h2, r2, c2, v2 = mmio.read_mtx(path)
    assert h1 == h2
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(v1, v2)


def test_native_large_file_parallel_path(lib, tmp_path):
    """>100k entries activates the OpenMP multi-chunk path."""
    a = fixtures.random_csr(600, 600, density=0.4, seed=60)
    from ia_spgemm_tpu.formats.types import CSR
    p = tmp_path / "big.mtx"
    mmio.write_mtx(str(p), CSR.from_scipy(a))
    assert a.nnz > 100000
    h1, r1, c1, v1 = native.read_mtx(str(p))
    h2, r2, c2, v2 = mmio.read_mtx(str(p))
    assert h1.nnz_stored == a.nnz
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(v1, v2)


def test_native_error_codes(lib, tmp_path):
    p = tmp_path / "bad.mtx"
    p.write_text("%%MatrixMarket matrix coordinate complex general\n"
                 "2 2 1\n1 1 1.0 2.0\n")
    with pytest.raises(mmio.MatrixMarketError, match="COMPLEX"):
        native.read_mtx(str(p))
    with pytest.raises(mmio.MatrixMarketError, match="open"):
        native.read_mtx(str(tmp_path / "missing.mtx"))


def test_read_mtx_to_csr_uses_native(lib, tmp_path):
    path = fixtures.mtx_file(tmp_path, "symmetric_real")
    via_native = mmio.read_mtx_to_csr(path, use_native=True)
    via_python = mmio.read_mtx_to_csr(path, use_native=False)
    np.testing.assert_array_equal(np.asarray(via_native.row_ptr),
                                  np.asarray(via_python.row_ptr))
    np.testing.assert_array_equal(np.asarray(via_native.values),
                                  np.asarray(via_python.values))


def test_native_driver_builds_and_parses_args():
    """The embedded-CPython driver binary (native/spgemm_run.cpp — the
    reference's C++-main + embedded-interpreter architecture,
    main.cpp:682-704). --help exits before any heavy import."""
    import os
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    binary = os.path.join(root, "native", "spgemm-run")
    if not os.path.exists(binary):
        r = subprocess.run(["make", "-C", os.path.join(root, "native"),
                            "spgemm-run"], capture_output=True)
        if r.returncode != 0:
            pytest.skip("cannot build native driver")
    out = subprocess.run([binary, "--help"], capture_output=True,
                         cwd=root, timeout=120)
    assert out.returncode == 0
    assert b"spgemm-run" in out.stdout
