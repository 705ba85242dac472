"""I/O tests: our reader vs scipy.io.mmread on synthetic fixtures and the
reference's Inputs/ suite (when mounted)."""

import numpy as np
import pytest
import scipy.io
import scipy.sparse

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


def test_array_format_matches_scipy(tmp_path):
    """MM `array` (dense) read — mm_read_mtx_array_size support
    (reference mmio.h:27,110): column-major body, all entries stored."""
    rng = np.random.default_rng(3)
    dense = rng.standard_normal((5, 4))
    path = tmp_path / "dense.mtx"
    scipy.io.mmwrite(str(path), dense)
    ours = mmio.read_mtx_to_csr(path).to_scipy().toarray()
    np.testing.assert_allclose(ours, dense, rtol=0, atol=0)


@pytest.mark.parametrize("sym", ["symmetric", "skew-symmetric"])
def test_array_format_symmetric(tmp_path, sym):
    """Symmetric/skew array files store the (strictly-)lower triangle
    column-major; expansion must reconstruct the full matrix."""
    rng = np.random.default_rng(4)
    low = np.tril(rng.standard_normal((6, 6)), -1)
    dense = low - low.T if sym == "skew-symmetric" else \
        low + low.T + np.diag(rng.standard_normal(6))
    path = tmp_path / "symdense.mtx"
    scipy.io.mmwrite(str(path), dense, symmetry=sym)
    ours = mmio.read_mtx_to_csr(path).to_scipy().toarray()
    np.testing.assert_allclose(ours, dense, rtol=0, atol=0)


def test_array_pattern_rejected(tmp_path):
    path = tmp_path / "bad.mtx"
    path.write_text("%%MatrixMarket matrix array pattern general\n2 2\n")
    with pytest.raises(mmio.MatrixMarketError):
        mmio.read_mtx(str(path))


@pytest.mark.parametrize("sym", ["symmetric", "skew-symmetric"])
def test_write_symmetric_typecode_roundtrip(tmp_path, sym):
    """write_mtx can emit the symmetric typecodes (mm_write_*, reference
    mmio.h:48-59): lower triangle stored, scipy and our reader both
    reconstruct the full matrix."""
    from ia_spgemm_tpu.formats.types import CSR
    rng = np.random.default_rng(5)
    low = np.tril(rng.standard_normal((7, 7)), -1)
    low[np.abs(low) < 0.6] = 0.0
    dense = low - low.T if sym == "skew-symmetric" else \
        low + low.T + np.diag(np.arange(1.0, 8.0))
    a = scipy.sparse.csr_matrix(dense)
    path = tmp_path / "out.mtx"
    mmio.write_mtx(str(path), CSR.from_scipy(a), symmetry=sym)
    banner = path.read_text().splitlines()[0]
    assert banner == f"%%MatrixMarket matrix coordinate real {sym}"
    back_scipy = scipy.io.mmread(str(path)).toarray()
    np.testing.assert_allclose(back_scipy, dense, rtol=0, atol=0)
    back_ours = mmio.read_mtx_to_csr(str(path)).to_scipy().toarray()
    np.testing.assert_allclose(back_ours, dense, rtol=0, atol=0)


def test_write_symmetric_rejects_asymmetric(tmp_path):
    """Writing a non-symmetric matrix with a symmetric typecode would
    silently corrupt it on read-back — must raise instead."""
    from ia_spgemm_tpu.formats.types import CSR
    a = scipy.sparse.csr_matrix(
        np.array([[1.0, 2.0], [3.0, 4.0]]))
    with pytest.raises(mmio.MatrixMarketError, match="not symmetric"):
        mmio.write_mtx(str(tmp_path / "x.mtx"), CSR.from_scipy(a),
                       symmetry="symmetric")
    with pytest.raises(mmio.MatrixMarketError, match="not skew"):
        mmio.write_mtx(str(tmp_path / "y.mtx"), CSR.from_scipy(a),
                       symmetry="skew-symmetric")


def test_truncated_mtx_raises_not_hangs(tmp_path):
    """EOF during comment skipping must raise (readline() returns ''
    forever at EOF — this used to spin)."""
    p = tmp_path / "trunc.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n%hm\n")
    with pytest.raises(mmio.MatrixMarketError, match="EOF"):
        mmio.read_header(str(p))
    with pytest.raises(mmio.MatrixMarketError, match="EOF"):
        mmio.read_mtx(str(p))


def test_array_header_counts_stored_triangle(tmp_path):
    """read_header's nnz_stored must agree with what read_mtx returns for
    symmetric array files (the stored triangle, not nrows*ncols)."""
    low = np.tril(np.arange(1.0, 10.0).reshape(3, 3))
    d = low + low.T - np.diag(np.diag(low))
    p = tmp_path / "symarr.mtx"
    scipy.io.mmwrite(str(p), d, symmetry="symmetric")
    h = mmio.read_header(str(p))
    _, r, _, _ = mmio.read_mtx(str(p))
    assert h.nnz_stored == len(r) == 6
