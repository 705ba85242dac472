"""ESC (expand–sort–compress) SpGEMM — the default TPU path.

The reference's CPU CSR kernel is a Gustavson two-phase with per-thread
linked-list accumulators (csr/common_csr.h:85-193); its GPU kernels are
Thrust ESC pipelines (csr_dev/common_csr_dev.h:134-254,
coo_dev/common_coo_dev.h:178-602). On TPU, per-element linked lists and
random scatter are hostile to the VPU, while large sorts and segment
reductions map directly onto XLA primitives — so ESC is the idiomatic
default here:

  phase 1 (symbolic): expansion size E = sum over a_ij of nnz(B row j)
           — identical to the reference's symbolic nnz-upper-bound pass
           and to GetFlop (csr/common_csr.h:290-304).
  phase 2 (numeric): materialize all E intermediate products (i, j, a*b),
           lexicographic sort by (i, j), mark segment heads, segment-sum.

Because XLA requires static shapes, the data-dependent sizes (E, nnz(C))
are handled by a host-side planner that pads to power-of-two buckets
(bounding recompiles), and the true nnz travels as a 0-d array.
Output columns are sorted within each row (the reference emits unsorted,
reversed insertion order — csr/common_csr.h:173-187; sorted is canonical).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ia_spgemm_tpu import config as cfg
from ia_spgemm_tpu.formats.types import COO, CSR


@dataclasses.dataclass(frozen=True)
class SpGEMMPlan:
    """Static capacities for one (A, B) SpGEMM problem."""
    expansion_capacity: int   # >= E (number of intermediate products)
    out_capacity: int         # >= nnz(C)
    flops: int                # exact E — the reference's GetFlop(A, B)


def plan_spgemm(A: CSR, B: CSR, *,
                bucket: bool = True) -> SpGEMMPlan:
    """Host-side symbolic pass: computes the exact expansion size from the
    row pointers only (no values touched)."""
    rpB = np.asarray(B.row_ptr)
    b_len = np.diff(rpB).astype(np.int64)
    nnzA = int(A.nnz)
    colA = np.asarray(A.col_ind)[:nnzA].astype(np.int64)
    E = int(b_len[np.clip(colA, 0, B.nrows - 1)].sum()) if nnzA else 0
    e_cap = cfg.bucket_capacity(E, enabled=bucket)
    out_cap = cfg.bucket_capacity(min(E, A.nrows * B.ncols) or 1,
                                  enabled=bucket)
    return SpGEMMPlan(expansion_capacity=e_cap, out_capacity=out_cap,
                      flops=E)


def _entry_rows_from_row_ptr(row_ptr: jax.Array, capacity: int) -> jax.Array:
    """Row index of each stored entry (CSR row expansion)."""
    idx = jnp.arange(capacity, dtype=jnp.int32)
    return jnp.searchsorted(row_ptr, idx, side="right").astype(jnp.int32) - 1


@functools.partial(
    jax.jit,
    static_argnames=("e_cap", "out_cap", "m", "n", "k"))
def _esc_core(a_row, a_col, a_val, a_nnz,
              b_row_ptr, b_col, b_val,
              *, e_cap: int, out_cap: int, m: int, k: int, n: int):
    """Format-agnostic ESC core over A's entry list.

    a_row/a_col/a_val: (nnzA_cap,) — row, col, value per stored A entry.
    Returns (row_ptr, col_ind, values, nnz) of C = A @ B, padded to out_cap.
    """
    nnzA_cap = a_col.shape[0]
    val_dtype = jnp.result_type(a_val.dtype, b_val.dtype)
    ent = jnp.arange(nnzA_cap, dtype=jnp.int32)
    ent_valid = ent < a_nnz

    a_col_c = jnp.clip(a_col, 0, k - 1)
    b_start = b_row_ptr[a_col_c]
    b_len = jnp.where(ent_valid, b_row_ptr[a_col_c + 1] - b_start, 0)
    offs_end = jnp.cumsum(b_len, dtype=jnp.int32)
    E = offs_end[-1] if nnzA_cap else jnp.int32(0)
    offs_start = offs_end - b_len

    # --- expand: product e belongs to A entry t, the `within`-th entry of
    # B's row a_col[t] ---
    e = jnp.arange(e_cap, dtype=jnp.int32)
    t = jnp.searchsorted(offs_end, e, side="right").astype(jnp.int32)
    valid = e < E
    t_c = jnp.clip(t, 0, nnzA_cap - 1)
    within = e - offs_start[t_c]
    i = a_row[t_c]
    bpos = jnp.clip(b_start[t_c] + within, 0, b_col.shape[0] - 1)
    j = b_col[bpos]
    v = a_val[t_c].astype(val_dtype) * b_val[bpos].astype(val_dtype)
    i = jnp.where(valid, i, m).astype(jnp.int32)
    j = jnp.where(valid, j, n).astype(jnp.int32)
    v = jnp.where(valid, v, 0)

    # --- sort lexicographically by (i, j); invalid (m, n) sorts last ---
    i_s, j_s, v_s = jax.lax.sort((i, j, v), num_keys=2)

    # --- compress: segment heads and segment sums ---
    valid_s = i_s < m
    prev_i = jnp.concatenate([jnp.full(1, -1, jnp.int32), i_s[:-1]])
    prev_j = jnp.concatenate([jnp.full(1, -1, jnp.int32), j_s[:-1]])
    head = valid_s & ((i_s != prev_i) | (j_s != prev_j))
    seg = jnp.cumsum(head, dtype=jnp.int32) - 1
    seg_c = jnp.clip(seg, 0, out_cap - 1)
    nnz_c = jnp.sum(head, dtype=jnp.int32)

    c_val = jax.ops.segment_sum(v_s, seg_c, num_segments=out_cap)
    c_col = jax.ops.segment_max(jnp.where(head, j_s, -1), seg_c,
                                num_segments=out_cap)
    row_of_seg = jax.ops.segment_max(jnp.where(head, i_s, -1), seg_c,
                                     num_segments=out_cap)

    seg_ids = jnp.arange(out_cap, dtype=jnp.int32)
    seg_valid = seg_ids < nnz_c
    c_col = jnp.where(seg_valid, c_col, n).astype(jnp.int32)
    c_val = jnp.where(seg_valid, c_val, 0)

    counts = jnp.zeros(m + 1, dtype=jnp.int32).at[
        jnp.where(seg_valid, row_of_seg, m)].add(1)
    row_ptr = jnp.concatenate([
        jnp.zeros(1, jnp.int32),
        jnp.cumsum(counts[:m], dtype=jnp.int32)])
    return row_ptr, c_col, c_val, nnz_c


def spgemm_csr(A: CSR, B: CSR, plan: SpGEMMPlan | None = None) -> CSR:
    """C = A @ B with both operands CSR. The TPU analogue of the reference's
    CSR_MUL_CSR (csr/common_csr.h:85-193)."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    if plan is None:
        plan = plan_spgemm(A, B)
    a_row = _entry_rows_from_row_ptr(A.row_ptr, A.capacity)
    row_ptr, col, val, nnz = _esc_core(
        a_row, A.col_ind, A.values, A.nnz,
        B.row_ptr, B.col_ind, B.values,
        e_cap=plan.expansion_capacity, out_cap=plan.out_capacity,
        m=A.nrows, k=A.ncols, n=B.ncols)
    return CSR(row_ptr=row_ptr, col_ind=col, values=val, nnz=nnz,
               shape=(A.nrows, B.ncols))


def spgemm_coo(A: COO, B: COO, plan: SpGEMMPlan | None = None) -> COO:
    """C = A @ B with both operands COO. The reference's COO_MUL_COO uses
    linear probing into the output row (coo/common_coo.h:72-161); here the
    same products go through the ESC core using A's materialized row_ind."""
    from ia_spgemm_tpu.formats.convert import coo_to_csr, csr_to_coo
    if plan is None:
        plan = plan_spgemm(coo_to_csr(A), coo_to_csr(B))
    row_ptr, col, val, nnz = _esc_core(
        A.row_ind, A.col_ind, A.values, A.nnz,
        B.row_offset, B.col_ind, B.values,
        e_cap=plan.expansion_capacity, out_cap=plan.out_capacity,
        m=A.nrows, k=A.ncols, n=B.ncols)
    return csr_to_coo(CSR(row_ptr=row_ptr, col_ind=col, values=val, nnz=nnz,
                          shape=(A.nrows, B.ncols)))
