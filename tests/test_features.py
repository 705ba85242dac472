"""Feature extraction + density image parity vs an independent numpy
reimplementation of the reference's exact algorithms
(csr/common_csr.h:257-287, main.cpp:512-643)."""

import numpy as np
import pytest

from tests.conftest import fp_tol
from ia_spgemm_tpu.formats import convert
from ia_spgemm_tpu.formats.types import CSR
from ia_spgemm_tpu.io import mmio
from ia_spgemm_tpu.ops import density, features
from tests import fixtures
from tests.conftest import reference_input_paths


def _ref_info1(a):
    """Literal port of GetInfo1's arithmetic for testing."""
    m, n = a.shape
    nnz = a.nnz
    nnz_row = np.diff(a.indptr)
    mean = nnz / m
    var = np.sum((nnz_row - mean) ** 2) / (m - 1) if m > 1 else 0.0
    return np.array([m, n, nnz, nnz / (m * n), nnz_row.max(), nnz_row.min(),
                     mean, var, np.sqrt(var) / mean])


def _ref_density(a, size=128):
    """Literal port of the reference's density histogram (main.cpp:520-565)."""
    m, n = a.shape
    img = np.zeros((size, size), dtype=np.int64)
    coo = a.tocoo()
    for i, j in zip(coo.row, coo.col):
        i_s = i * size // m
        i_e = i_s + (size // m) if m < size else i_s
        j_s = j * size // n
        j_e = j_s + (size // n) if n < size else j_s
        for k in range(i_s, i_e + 1):
            for l in range(j_s, j_e + 1):
                if k < size and l < size:
                    img[k, l] += 1
    return img


@pytest.mark.parametrize("name,mat", [
    ("small", fixtures.random_csr(10, 10, 0.3, seed=30)),
    ("wide", fixtures.random_csr(12, 200, 0.05, seed=31)),
    ("tall", fixtures.random_csr(300, 9, 0.05, seed=32)),
    ("big", fixtures.random_csr(400, 400, 0.01, seed=33)),
    ("exact128", fixtures.random_csr(128, 128, 0.05, seed=34)),
])
def test_info1_matches_reference(name, mat):
    A = CSR.from_scipy(mat)
    got = np.asarray(features.get_info1(A))
    np.testing.assert_allclose(got, _ref_info1(mat), rtol=fp_tol())


@pytest.mark.parametrize("name,mat", [
    ("small", fixtures.random_csr(10, 10, 0.3, seed=30)),
    ("wide", fixtures.random_csr(12, 200, 0.05, seed=31)),
    ("tall", fixtures.random_csr(300, 9, 0.05, seed=32)),
    ("big", fixtures.random_csr(400, 400, 0.01, seed=33)),
    ("exact128", fixtures.random_csr(128, 128, 0.05, seed=34)),
])
def test_density_matches_reference(name, mat):
    A = CSR.from_scipy(mat)
    got = np.asarray(density.density_image(A))
    np.testing.assert_array_equal(got, _ref_density(mat))


@pytest.mark.parametrize("path", reference_input_paths())
def test_reference_inputs_density(path):
    A = mmio.read_mtx_to_csr(path)
    got = np.asarray(density.density_image(A))
    np.testing.assert_array_equal(got, _ref_density(A.to_scipy()))


def test_info2_info3():
    mat = fixtures.banded_csr(20, bandwidth=1, seed=35)
    A = CSR.from_scipy(mat)
    d = convert.csr_to_dia(A, check_guard=False)
    i2 = np.asarray(features.get_info2(d))
    m, n = mat.shape
    nd = d.num_diagonals
    np.testing.assert_allclose(
        i2, [nd, nd / (m + n - 1), nd * m / (m * n)], rtol=fp_tol())
    e = convert.csr_to_ell(A, check_guard=False)
    i3 = np.asarray(features.get_info3(e))
    np.testing.assert_allclose(
        i3, [mat.nnz / (m * e.max_nnz_per_row)], rtol=fp_tol())


def test_feature_vector_layout():
    """26 features in the reference's order (main.cpp:651-679)."""
    a = fixtures.random_csr(15, 15, 0.2, seed=36)
    b = fixtures.random_csr(15, 15, 0.25, seed=37)
    A, B = CSR.from_scipy(a), CSR.from_scipy(b)
    fv = np.asarray(features.feature_vector(A, B))
    assert fv.shape == (26,)
    np.testing.assert_allclose(fv[:9], _ref_info1(a), rtol=fp_tol())
    np.testing.assert_allclose(fv[9:18], _ref_info1(b), rtol=fp_tol())
    d = convert.csr_to_dia(A, check_guard=False)
    assert fv[18] == d.num_diagonals
    e = convert.csr_to_ell(A, check_guard=False)
    np.testing.assert_allclose(fv[24], a.nnz / (15 * e.max_nnz_per_row),
                               rtol=fp_tol())


def test_density_image_file_roundtrip(tmp_path):
    mat = fixtures.random_csr(50, 50, 0.1, seed=38)
    A = CSR.from_scipy(mat)
    img = density.density_image(A)
    p = tmp_path / "img1.txt"
    density.write_density_image(str(p), img)
    back = density.read_density_image(str(p))
    np.testing.assert_array_equal(back, np.asarray(img))
    # file layout: one value per line, 16384 lines (MatNet.py:12-20)
    assert len(p.read_text().splitlines()) == 128 * 128


def test_get_info1_density_no_int32_overflow():
    """Regression: ncols traces as an int32 scalar inside _info1's jit, so
    an integer m * ncols product wrapped at m = n = 65536 (2^32 -> 0 ->
    inf density). Two such samples poisoned a harvest checkpoint. The
    denominator must be computed in float."""
    import jax.numpy as jnp
    m = 65536
    row_ptr = jnp.asarray(np.arange(m + 1, dtype=np.int32) * 3)
    f = np.asarray(features._info1(row_ptr, jnp.int32(3 * m), np.int32(m)))
    assert np.isfinite(f).all()
    np.testing.assert_allclose(f[3], (3 * m) / (float(m) * m), rtol=1e-6)
