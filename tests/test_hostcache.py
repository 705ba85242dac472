"""Device->host view cache (utils/hostcache): registered views must be
bit-identical to a real D2H pull, and planning must be unchanged with
the cache cleared."""

import numpy as np

from ia_spgemm_tpu.formats import convert
from ia_spgemm_tpu.formats.types import CSR
from ia_spgemm_tpu.utils import hostcache
from tests import fixtures


def test_from_scipy_registers_views():
    a = fixtures.random_csr(64, 64, density=0.08, seed=31)
    A = CSR.from_scipy(a.astype(np.float32))
    for dev in (A.row_ptr, A.col_ind, A.values):
        v = hostcache.peek(dev)
        assert v is not None
        np.testing.assert_array_equal(v, np.asarray(dev))


def test_ell_thunk_matches_device():
    """The lazily-derived host ELL grids equal the device conversion
    bit-for-bit (cols incl. -1 padding, values, nnz_row)."""
    a = fixtures.random_csr(80, 80, density=0.06, seed=32)
    A = CSR.from_scipy(a.astype(np.float32))
    E = convert.csr_to_ell(A, check_guard=False)
    for dev in (E.col_ind, E.values, E.nnz_row):
        v = hostcache.peek(dev)
        assert v is not None
        np.testing.assert_array_equal(np.asarray(v), np.asarray(dev))


def test_planning_identical_without_cache():
    """The multiclass plan (and its result) must not depend on whether
    the host views were cached or pulled."""
    from ia_spgemm_tpu.ops import bitonic
    a = fixtures.random_csr(96, 96, density=0.07, seed=33)
    A = CSR.from_scipy(a.astype(np.float32))
    E = convert.csr_to_ell(A, check_guard=False)
    bitonic.clear_plan_cache()
    C1 = bitonic.spgemm_bitonic_multiclass(E, E, assemble="bcsr")
    s1 = None if C1 is None else float(C1.checksum())
    hostcache.clear()
    bitonic.clear_plan_cache()
    C2 = bitonic.spgemm_bitonic_multiclass(E, E, assemble="bcsr")
    s2 = None if C2 is None else float(C2.checksum())
    assert (s1 is None) == (s2 is None)
    if s1 is not None:
        assert abs(s1 - s2) <= 1e-6 * max(1.0, abs(s1))


def test_cache_bounded():
    hostcache.clear()
    import jax.numpy as jnp
    keep = []
    for i in range(60):
        x = jnp.zeros((4,), jnp.int32) + i
        keep.append(x)
        hostcache.register(x, np.asarray(x))
    assert len(hostcache._CACHE) <= hostcache._MAX
