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
    # empty matrix: mean = 0 would make cv NaN, and ONE NaN feature
    # poisons a whole harvest checkpoint (load_samples refuses it)
    cv = jnp.where(mean > 0, jnp.sqrt(var) / mean, 0.0)
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


def _info2_from_scalars(m: int, n: int, nd: int, dt) -> jax.Array:
    return jnp.asarray(
        [float(nd), nd / (m + n - 1), (nd * float(m)) / (float(m) * n)],
        dtype=dt)


def _info3_from_scalars(m: int, K: int, nnz, dt) -> jax.Array:
    return jnp.asarray([jnp.asarray(nnz, dt)
                        / (float(max(m, 1)) * max(int(K), 1))])


def feature_vector(A: CSR, B: CSR,
                   A_dia: DIA | None = None, B_dia: DIA | None = None,
                   A_ell: ELL | None = None, B_ell: ELL | None = None
                   ) -> jax.Array:
    """The CPU driver's 26-feature MatNet input (main.cpp:651-679).

    When a format is rejected by its viability guard, the corresponding
    slots stay 0 — matching the reference, which pre-zeroes features[]
    (main.cpp:652-653) and skips nothing explicitly but computes on
    unallocated structs; zeros are the only sane reading.

    The DIA/ELL features need only the PLANNER scalars (num_diagonals,
    K): callers that haven't already converted get them from
    plan_dia_offsets/plan_ell_width instead of materializing dense
    (m, ndiag)/(m, K) value arrays the guard allows to reach 50x the
    CSR's bytes, only to read one integer back.
    """
    from ia_spgemm_tpu.formats import convert

    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    z3 = jnp.zeros(3, dt)
    z1 = jnp.zeros(1, dt)

    def info2(M, M_dia):
        if M_dia is not None:
            return get_info2(M_dia)
        nd = len(convert.plan_dia_offsets(M))
        if not convert.dia_viable(M.nrows, M.ncols, int(M.nnz), nd):
            return z3
        # csr_to_dia coerces zero occupied diagonals to one empty slot
        # AFTER its guard — mirror it, or the scalar path would emit
        # [0,0,0] where the materializing path emits get_info2(nd=1)
        return _info2_from_scalars(M.nrows, M.ncols, max(nd, 1), dt)

    def info3(M, M_ell):
        if M_ell is not None:
            return get_info3(M_ell)
        K = convert.plan_ell_width(M)
        if not convert.ell_viable(M.nrows, int(M.nnz), K):
            return z1
        return _info3_from_scalars(M.nrows, K, M.nnz, dt)

    parts = [
        get_info1(A), get_info1(B),
        info2(A, A_dia), info2(B, B_dia),
        info3(A, A_ell), info3(B, B_ell),
    ]
    return jnp.concatenate([p.astype(dt) for p in parts])
