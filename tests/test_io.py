"""I/O tests: our reader vs scipy.io.mmread on synthetic fixtures and the
reference's Inputs/ suite (when mounted)."""

import numpy as np
import pytest
import scipy.io

from ia_spgemm_tpu.io import mmio
from tests import fixtures
from tests.conftest import reference_input_paths


@pytest.mark.parametrize("kind", fixtures.ALL_KINDS)
def test_read_matches_scipy(tmp_path, kind):
    path = fixtures.mtx_file(tmp_path, kind)
    ours = mmio.read_mtx_to_csr(path).to_scipy()
    oracle = fixtures.scipy_oracle_from_text(kind).tocsr()
    oracle.sum_duplicates()
    got = ours.copy()
    got.sum_duplicates()
    got.sort_indices()
    oracle.sort_indices()
    assert got.shape == oracle.shape
    np.testing.assert_array_equal(got.indptr, oracle.indptr)
    np.testing.assert_array_equal(got.indices, oracle.indices)
    np.testing.assert_allclose(got.data, oracle.data, rtol=0, atol=0)


@pytest.mark.parametrize("path", reference_input_paths())
def test_reference_inputs_match_scipy(path):
    ours = mmio.read_mtx_to_csr(path).to_scipy()
    oracle = scipy.io.mmread(path).tocsr()
    oracle.sum_duplicates()
    ours.sum_duplicates()
    ours.sort_indices()
    oracle.sort_indices()
    assert ours.shape == oracle.shape
    assert abs(ours - oracle).max() == 0


def test_symmetric_expansion_order():
    """Symmetric mirror entries must interleave right after their source
    (reference scatter order, main.cpp:373-401)."""
    header = mmio.MatrixMarketHeader(
        "matrix", "coordinate", "real", "symmetric", 3, 3, 3)
    rows = np.array([0, 1, 2], dtype=np.int32)
    cols = np.array([0, 0, 1], dtype=np.int32)
    vals = np.array([5.0, 6.0, 7.0])
    r, c, v = mmio.expand_symmetric(header, rows, cols, vals)
    np.testing.assert_array_equal(r, [0, 1, 0, 2, 1])
    np.testing.assert_array_equal(c, [0, 0, 1, 1, 2])
    np.testing.assert_array_equal(v, [5.0, 6.0, 6.0, 7.0, 7.0])


def test_csr_assembly_preserves_file_order_within_row():
    rows = np.array([1, 0, 1, 0], dtype=np.int32)
    cols = np.array([2, 3, 0, 1], dtype=np.int32)
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    row_ptr, col_ind, values = mmio.coo_to_csr_arrays(2, rows, cols, vals)
    np.testing.assert_array_equal(row_ptr, [0, 2, 4])
    np.testing.assert_array_equal(col_ind, [3, 1, 2, 0])  # file order kept
    np.testing.assert_array_equal(values, [2.0, 4.0, 1.0, 3.0])


def test_complex_rejected(tmp_path):
    p = tmp_path / "c.mtx"
    p.write_text("%%MatrixMarket matrix coordinate complex general\n"
                 "2 2 1\n1 1 1.0 2.0\n")
    with pytest.raises(mmio.MatrixMarketError):
        mmio.read_mtx(str(p))


def test_write_roundtrip(tmp_path):
    a = fixtures.random_csr(17, 13, density=0.2, seed=3)
    from ia_spgemm_tpu.formats.types import CSR
    csr = CSR.from_scipy(a)
    out = tmp_path / "rt.mtx"
    mmio.write_mtx(str(out), csr)
    back = mmio.read_mtx_to_csr(str(out)).to_scipy()
    assert abs(back - a).max() < 1e-14


def test_pattern_values_are_one(tmp_path):
    path = fixtures.mtx_file(tmp_path, "pattern_general")
    csr = mmio.read_mtx_to_csr(path)
    nnz = int(csr.nnz)
    np.testing.assert_array_equal(np.asarray(csr.values)[:nnz], 1.0)
