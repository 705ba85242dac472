"""Feature extraction for MatNet — vectorized GetInfo1/2/3.

Layouts and formulas match the reference exactly:
- get_info1: 9 CSR stats (csr/common_csr.h:257-287): rows, cols, nnz,
  density nnz/(m*n), max nnz/row, min nnz/row, mean nnz/row,
  variance (/(m-1)), coefficient of variation sd/mean.
- get_info2: 3 DIA stats (dia/common_dia.h:222-233): num_diagonals,
  ndiag/(m+n-1), (ndiag*m)/(m*n).
- get_info3: 1 ELL stat (ell/common_ell.h:222-229): nnz/(m*K).
- feature_vector: the CPU driver's 26-feature layout (main.cpp:651-679):
  [0..8]=info1(A), [9..17]=info1(B), [18..20]=info2(A), [21..23]=info2(B),
  [24]=info3(A), [25]=info3(B).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ia_spgemm_tpu.formats.types import CSR, DIA, ELL


@jax.jit
def _info1(row_ptr, nnz, ncols: int):
    m = row_ptr.shape[0] - 1
    nnz_row = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.float64
                                                  if jax.config.jax_enable_x64
                                                  else jnp.float32)
    nnzf = nnz.astype(nnz_row.dtype)
    mean = nnzf / m
    maxr = jnp.max(nnz_row)
    minr = jnp.min(nnz_row)
    # Reference divides by (row - 1) — sample variance (csr/common_csr.h:281).
    var = jnp.sum((nnz_row - mean) ** 2) / jnp.maximum(m - 1, 1)
    cv = jnp.sqrt(var) / mean
    # density denominator in FLOAT: ncols is a traced int32 here, so an
    # integer m * ncols wraps at m = n = 65536 (2^32 -> 0 -> inf density;
    # poisoned a harvest checkpoint before being caught)
    ncolsf = jnp.asarray(ncols, nnz_row.dtype)
    return jnp.stack([
        jnp.asarray(m, nnz_row.dtype),
        ncolsf,
        nnzf,
        nnzf / (m * ncolsf),
        maxr, minr, mean, var, cv])


def get_info1(A: CSR) -> jax.Array:
    """(9,) CSR features (reference: csr/common_csr.h:257-287)."""
    return _info1(A.row_ptr, A.nnz, A.ncols)


def get_info2(A: DIA) -> jax.Array:
    """(3,) DIA features (reference: dia/common_dia.h:222-233)."""
    m, n = A.shape
    nd = float(A.num_diagonals)
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return jnp.asarray([nd, nd / (m + n - 1), (nd * m) / (m * n)], dtype=dt)


def get_info3(A: ELL) -> jax.Array:
    """(1,) ELL fill feature (reference: ell/common_ell.h:222-229)."""
    m, _ = A.shape
    K = A.max_nnz_per_row
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return jnp.asarray([A.nnz.astype(dt) / (float(m) * max(int(K), 1))])


def feature_vector(A: CSR, B: CSR,
                   A_dia: DIA | None = None, B_dia: DIA | None = None,
                   A_ell: ELL | None = None, B_ell: ELL | None = None
                   ) -> jax.Array:
    """The CPU driver's 26-feature MatNet input (main.cpp:651-679).

    When a format was rejected by its viability guard, the corresponding
    slots stay 0 — matching the reference, which pre-zeroes features[]
    (main.cpp:652-653) and skips nothing explicitly but computes on
    unallocated structs; zeros are the only sane reading.
    """
    from ia_spgemm_tpu.formats import convert

    if A_dia is None:
        A_dia = convert.csr_to_dia(A)
    if B_dia is None:
        B_dia = convert.csr_to_dia(B)
    if A_ell is None:
        A_ell = convert.csr_to_ell(A)
    if B_ell is None:
        B_ell = convert.csr_to_ell(B)

    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    z3 = jnp.zeros(3, dt)
    z1 = jnp.zeros(1, dt)
    parts = [
        get_info1(A), get_info1(B),
        get_info2(A_dia) if A_dia is not None else z3,
        get_info2(B_dia) if B_dia is not None else z3,
        get_info3(A_ell) if A_ell is not None else z1,
        get_info3(B_ell) if B_ell is not None else z1,
    ]
    return jnp.concatenate([p.astype(dt) for p in parts])
