"""Format conversion tests: every conversion round-trips through scipy and
the viability guards replicate the reference's size rules."""

import numpy as np
import pytest

from ia_spgemm_tpu.formats import convert
from ia_spgemm_tpu.formats.types import CSR
from tests import fixtures


def _mats():
    return [
        ("random", fixtures.random_csr(20, 17, density=0.15, seed=1)),
        ("banded", fixtures.banded_csr(25, bandwidth=2, seed=2)),
        ("square", fixtures.random_csr(16, 16, density=0.3, seed=3)),
        ("skinny", fixtures.random_csr(40, 5, density=0.2, seed=4)),
        ("single", fixtures.random_csr(1, 8, density=0.5, seed=5)),
    ]


@pytest.mark.parametrize("name,mat", _mats())
def test_coo_roundtrip(name, mat):
    A = CSR.from_scipy(mat)
    coo = convert.csr_to_coo(A)
    assert abs(coo.to_scipy().tocsr() - mat).max() == 0
    back = convert.coo_to_csr(coo)
    assert abs(back.to_scipy() - mat).max() == 0


@pytest.mark.parametrize("name,mat", _mats())
def test_ell_roundtrip(name, mat):
    A = CSR.from_scipy(mat)
    ell = convert.csr_to_ell(A, check_guard=False)
    assert ell.max_nnz_per_row >= 1
    assert abs(ell.to_scipy() - mat).max() == 0
    back = convert.ell_to_csr(ell)
    assert abs(back.to_scipy() - mat).max() == 0


@pytest.mark.parametrize("name,mat", _mats())
def test_dia_roundtrip(name, mat):
    A = CSR.from_scipy(mat)
    dia = convert.csr_to_dia(A, check_guard=False)
    assert abs(dia.to_scipy() - mat).max() == 0


@pytest.mark.parametrize("name,mat", _mats())
def test_dense_roundtrip(name, mat):
    A = CSR.from_scipy(mat)
    dense = convert.csr_to_dense(A)
    np.testing.assert_allclose(dense.values, mat.toarray(), atol=0)
    back = convert.dense_to_csr(dense)
    assert abs(back.to_scipy() - mat).max() == 0


@pytest.mark.parametrize("name,mat", _mats())
def test_transpose(name, mat):
    A = CSR.from_scipy(mat)
    At = convert.transpose_csr(A)
    assert abs(At.to_scipy() - mat.T).max() == 0


def test_dia_offsets_match_reference_numbering():
    """Reference offsets are n - m per occupied diagonal, ascending
    (dia/common_dia.h:63-71) == sorted unique (col - row)."""
    mat = fixtures.banded_csr(10, bandwidth=1, seed=7)
    A = CSR.from_scipy(mat)
    offs = convert.plan_dia_offsets(A)
    np.testing.assert_array_equal(offs, [-1, 0, 1])
    dia = convert.csr_to_dia(A, check_guard=False)
    # diag_ind maps dense diagonal index (offset + m - 1) -> slot
    m = A.nrows
    di = np.asarray(dia.diag_ind)
    assert di[-1 + m - 1] == 0 and di[0 + m - 1] == 1 and di[1 + m - 1] == 2


def test_size_formulas_match_reference_arithmetic():
    # sizeofcsr = 4*(m+1+nnz+3) + 8*nnz   (csr/common_csr.h:196-202)
    assert convert.sizeof_csr(10, 40) == 4 * (10 + 1 + 40 + 3) + 8 * 40
    # sizeofdia = 4*(m+n-1+nd+3) + 8*m*nd (dia/common_dia.h:20-26)
    assert convert.sizeof_dia(10, 12, 5) == 4 * (10 + 12 - 1 + 5 + 3) + 8 * 50
    # sizeofell = 4*(m+m*K+4) + 8*m*K     (ell/common_ell.h:21-27)
    assert convert.sizeof_ell(10, 6) == 4 * (10 + 60 + 4) + 8 * 60
    # sizeofcoo = 4*(m+1+2*nnz+3) + 8*nnz (coo/common_coo.h:20-26)
    assert convert.sizeof_coo(10, 40) == 4 * (10 + 1 + 80 + 3) + 8 * 40


def test_viability_guard_rejects_hyper_sparse_dia():
    """A matrix with one nnz per far-apart diagonal makes DIA explode; the
    50x guard must reject it (reference sets choice=false,
    dia/common_dia.h:56,89-92)."""
    import scipy.sparse as sp
    n = 2000
    rows = np.arange(0, n, 40)
    cols = (rows * 7 + 13) % n
    mat = sp.coo_matrix((np.ones(len(rows)), (rows, cols)),
                        shape=(n, n)).tocsr()
    A = CSR.from_scipy(mat)
    nd = len(convert.plan_dia_offsets(A))
    assert not convert.dia_viable(n, n, int(A.nnz), nd)
    assert convert.csr_to_dia(A) is None
    # CSR-sized formats stay viable
    assert convert.coo_viable(n, int(A.nnz))


def test_bcsr_to_csr_roundtrip():
    """BlockCSR -> CSR conversion compacts the 128-aligned blocks into
    exact CSR positions (scipy-equal)."""
    import scipy.sparse as sp
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    from ia_spgemm_tpu.ops import esc
    rng = np.random.default_rng(33)
    m = 150
    a = sp.random(m, m, density=0.07, random_state=33, format="csr")
    A = CSR.from_scipy(a.astype(np.float32))
    Cb = esc.spgemm_csr_tiled(A, A)
    assert Cb is not None
    C = convert.bcsr_to_csr(Cb)
    got = C.to_scipy().tocsr()
    want = Cb.to_scipy().tocsr()
    d = abs(got - want)
    assert (d.max() if d.nnz else 0.0) == 0.0
    assert int(C.nnz) == int(Cb.nnz)
    # row_ptr is exact (no padding slots between rows)
    assert np.array_equal(np.asarray(C.row_ptr),
                          np.concatenate([[0], np.cumsum(
                              np.asarray(Cb.nnz_row))]))


def test_csr_to_ell_rejects_truncating_width():
    """An explicit width below the longest row used to scatter overflow
    entries into the NEXT row's slots — must raise."""
    a = fixtures.random_csr(12, 12, density=0.5, seed=80)
    A = CSR.from_scipy(a)
    with pytest.raises(ValueError, match="cannot truncate"):
        convert.csr_to_ell(A, width=1, check_guard=False)


def test_csr_to_dia_drops_unlisted_diagonals():
    """Caller-supplied offsets that omit an occupied diagonal must DROP
    those entries, not overwrite slot 0 (the first listed diagonal)."""
    import scipy.sparse as sp
    d = sp.diags([[1.0, 2.0, 3.0], [7.0, 8.0]], [0, 1],
                 shape=(3, 3)).tocsr()
    A = CSR.from_scipy(d)
    D = convert.csr_to_dia(A, offsets=np.array([0]), check_guard=False)
    got = np.asarray(D.values)[:, 0]
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0])  # main diag intact


def test_gen_blockdiag_exact_size():
    from ia_spgemm_tpu.io import suitesparse
    assert suitesparse.gen_blockdiag(100).shape == (100, 100)
    assert suitesparse.gen_blockdiag(33).shape == (33, 33)
    assert suitesparse.gen_blockdiag(32).shape == (32, 32)


def test_features_finite_on_empty_matrix():
    import scipy.sparse as sp

    from ia_spgemm_tpu.ops import features
    A = CSR.from_scipy(sp.csr_matrix((8, 8)))
    fv = np.asarray(features.feature_vector(A, A))
    assert np.isfinite(fv).all()
