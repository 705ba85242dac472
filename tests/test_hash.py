"""Pallas hash-accumulator SpGEMM parity (interpreter mode on CPU)."""

import numpy as np
import pytest

from ia_spgemm_tpu.formats import convert
from ia_spgemm_tpu.formats.types import CSR
from ia_spgemm_tpu.ops import hash_spgemm
from tests import fixtures


@pytest.mark.parametrize("name,m,k,n", [
    ("square", 16, 16, 16),
    ("rect", 12, 20, 9),
    ("uneven", 13, 13, 13),
])
def test_hash_matches_oracle(name, m, k, n):
    a = fixtures.random_csr(m, k, density=0.25, seed=100)
    b = fixtures.random_csr(k, n, density=0.3, seed=101)
    A = convert.csr_to_ell(CSR.from_scipy(a.astype(np.float32)),
                           check_guard=False)
    B = convert.csr_to_ell(CSR.from_scipy(b.astype(np.float32)),
                           check_guard=False)
    C = hash_spgemm.spgemm_hash(A, B)
    got = C.to_scipy().toarray()
    np.testing.assert_allclose(got, (a @ b).toarray(), rtol=1e-5, atol=1e-5)
    # per-row nnz matches the structural count
    want_nnz = ((a @ b) != 0).sum()
    assert int(C.nnz) >= want_nnz  # >= because numeric zeros still occupy


def test_hash_collision_heavy():
    """Tiny table forces long probe chains; result must stay exact."""
    a = fixtures.random_csr(8, 8, density=0.6, seed=102)
    A = convert.csr_to_ell(CSR.from_scipy(a.astype(np.float32)),
                           check_guard=False)
    C = hash_spgemm.spgemm_hash(A, A, table_size=8)
    np.testing.assert_allclose(C.to_scipy().toarray(), (a @ a).toarray(),
                               rtol=1e-5, atol=1e-5)


def test_hash_budget_guard():
    big = fixtures.random_csr(2000, 2000, density=0.05, seed=103)
    A = convert.csr_to_ell(CSR.from_scipy(big.astype(np.float32)),
                           check_guard=False)
    with pytest.raises(ValueError, match="SMEM"):
        hash_spgemm.spgemm_hash(A, A)


def test_hash_viable_headline_scale():
    """Round-2 viability requirement: m = 32768 operands (B streamed from
    HBM by DMA; only the hash tables live in SMEM). Heavy on the scalar
    core, so gated to the real chip."""
    import os
    import pytest
    if os.environ.get("IA_SPGEMM_TEST_TPU") != "1":
        pytest.skip("scalar-probing at m=32768 needs the real chip")
    import numpy as np
    import scipy.sparse as sp
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.formats.types import CSR
    rng = np.random.RandomState(5)
    m = 32768
    a = sp.random(m, m, density=4.0 / m, random_state=rng,
                  dtype=np.float64, format="csr")
    a.sum_duplicates()
    A = convert.csr_to_ell(CSR.from_scipy(a.astype(np.float32)),
                           check_guard=False)
    C = hash_spgemm.spgemm_hash(A, A)
    want = (a @ a).tocsr()
    import jax.numpy as jnp
    got = float(jnp.sum(C.values))
    assert abs(got - want.sum()) / max(1.0, abs(want.sum())) < 1e-4
    assert int(C.nnz) == want.nnz
