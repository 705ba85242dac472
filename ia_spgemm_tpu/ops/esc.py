"""ESC (expand–sort–compress) SpGEMM — the default TPU path.

The reference's CPU CSR kernel is a Gustavson two-phase with per-thread
linked-list accumulators (csr/common_csr.h:85-193); its GPU kernels are
Thrust ESC pipelines (csr_dev/common_csr_dev.h:134-254,
coo_dev/common_coo_dev.h:178-602). On TPU, per-element linked lists and
random scatter are hostile to the VPU, while large sorts, cumulative scans
and bulk gathers map directly onto XLA primitives — so ESC is the idiomatic
default here:

  phase 1 (symbolic): expansion size E = sum over a_ij of nnz(B row j)
           — identical to the reference's symbolic nnz-upper-bound pass
           and to GetFlop (csr/common_csr.h:290-304).
  phase 2 (numeric): materialize all E intermediate products (i, j, a*b),
           sort by (i, j), compress equal keys by cumsum-differencing.

TPU performance notes (measured on v5e):
- binary-search expansion (searchsorted) costs ~70x more than a
  scatter+cummax segmented broadcast; every segment lookup here uses the
  scatter+cummax form.
- per-element scatters (segment_sum) cost ~3x a sort of the same size;
  the compress phase therefore uses a *compaction sort* of the
  (segment-id, element-index) pairs plus cumsum differences — no large
  scatters anywhere in the pipeline.
- gathers of k elements cost ~8 bytes/elem of effective bandwidth; pairs of
  arrays are packed (bitcast int32<->float32) into (n, 2) blocks so each
  logical double-gather is one XLA gather.

Because XLA requires static shapes, the data-dependent sizes (E, nnz(C))
are handled by a host-side planner that pads to geometric buckets
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

_INT32_MAX = np.int32(np.iinfo(np.int32).max)


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
    if E >= np.iinfo(np.int32).max:
        raise ValueError(
            f"expansion {E} overflows int32; row-partition the problem "
            "(ia_spgemm_tpu.parallel) instead")
    e_cap = cfg.bucket_capacity(E, enabled=bucket)
    out_cap = cfg.bucket_capacity(min(E, A.nrows * B.ncols) or 1,
                                  enabled=bucket)
    return SpGEMMPlan(expansion_capacity=e_cap, out_capacity=out_cap,
                      flops=E)


from ia_spgemm_tpu.utils.scans import (  # noqa: E402
    entry_rows,
    segment_broadcast as _segment_broadcast,
)

# Back-compat alias (used by parallel/distributed.py).
_entry_rows_from_row_ptr = entry_rows


def _packed_gather2(x_int: jax.Array, x_f: jax.Array,
                    idx: jax.Array):
    """Gather (x_int[idx], x_f[idx]) as ONE gather when dtypes allow packing
    (f32/i32); falls back to two gathers otherwise (fp64 CPU path).

    Packing must happen in the INT domain: bitcasting arbitrary int32 to
    float32 creates signaling-NaN payloads that TPU data movement
    canonicalizes (observed corrupting ~50% of values); int32 lanes move
    bit-exactly."""
    if x_f.dtype == jnp.float32:
        packed = jnp.stack(
            [x_int, jax.lax.bitcast_convert_type(x_f, jnp.int32)], axis=1)
        g = packed[idx]
        return g[:, 0], jax.lax.bitcast_convert_type(g[:, 1], jnp.float32)
    return x_int[idx], x_f[idx]


@functools.partial(
    jax.jit,
    static_argnames=("e_cap", "out_cap", "m", "n", "k"))
def _esc_core(a_row, a_col, a_val, a_nnz,
              b_row_ptr, b_col, b_val,
              *, e_cap: int, out_cap: int, m: int, k: int, n: int):
    """Format-agnostic ESC core over A's entry list.

    a_row/a_col/a_val: (nnzA_cap,) — row, col, value per stored A entry
    (a_row must be non-decreasing, i.e. entries in row order).
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

    # ---- expand: product slot e belongs to A entry t = the active segment
    # covering e (one scatter-max + cummax, not a binary search); the
    # entry's (row, value, B-row start, segment start) come back in ONE
    # packed 4-column gather at t. ----
    active = b_len > 0
    t = _segment_broadcast(ent + 1, offs_start, active, e_cap,
                           jnp.int32(0)) - 1
    t = jnp.clip(t, 0, nnzA_cap - 1)
    e = jnp.arange(e_cap, dtype=jnp.int32)
    valid = e < E
    if a_val.dtype == jnp.float32:
        ent_pack = jnp.stack(
            [a_row, jax.lax.bitcast_convert_type(a_val, jnp.int32),
             b_start, offs_start], axis=1)
        g = ent_pack[t]
        i = g[:, 0]
        av_t = jax.lax.bitcast_convert_type(g[:, 1], jnp.float32)
        bs_t = g[:, 2]
        start_e = g[:, 3]
    else:
        i = a_row[t]
        av_t = a_val[t]
        bs_t = b_start[t]
        start_e = offs_start[t]
    within = e - start_e
    bpos = jnp.clip(bs_t + within, 0, b_col.shape[0] - 1)
    j, bv = _packed_gather2(b_col, b_val, bpos)
    v = jnp.where(valid, av_t.astype(val_dtype) * bv.astype(val_dtype), 0)

    # ---- sort by (i, j): fused int32 key when m*n fits, else 2-key ----
    fused = (m + 1) * (n + 1) < 2**31
    if fused:
        key = jnp.where(valid, i * n + j, jnp.int32(m * n))
        key_s, v_s = jax.lax.sort((key, v), num_keys=1)
        valid_s = key_s < m * n
    else:
        i_sk = jnp.where(valid, i, m)
        j_sk = jnp.where(valid, j, n)
        i_s2, j_s2, v_s = jax.lax.sort((i_sk, j_sk, v), num_keys=2)
        key_s = None
        valid_s = i_s2 < m

    # ---- compress: boundaries + cumsum differences ----
    if fused:
        prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), key_s[:-1]])
        nxt = jnp.concatenate([key_s[1:], jnp.full(1, -1, jnp.int32)])
        head = valid_s & (key_s != prev)
        is_last = valid_s & (key_s != nxt)
    else:
        pi = jnp.concatenate([jnp.full(1, -1, jnp.int32), i_s2[:-1]])
        pj = jnp.concatenate([jnp.full(1, -1, jnp.int32), j_s2[:-1]])
        ni = jnp.concatenate([i_s2[1:], jnp.full(1, -1, jnp.int32)])
        nj = jnp.concatenate([j_s2[1:], jnp.full(1, -1, jnp.int32)])
        head = valid_s & ((i_s2 != pi) | (j_s2 != pj))
        is_last = valid_s & ((i_s2 != ni) | (j_s2 != nj))

    seg = jnp.cumsum(head, dtype=jnp.int32) - 1
    nnz_c = jnp.sum(head, dtype=jnp.int32)

    # values: one sorted segment-scatter. (A cumsum-difference compress is
    # ~2x faster but its absolute error scales with the GLOBAL running sum
    # — measured 27x relative error in f32 — so the exact reduction stays.)
    c_val_full = jax.ops.segment_sum(
        v_s, jnp.clip(seg, 0, out_cap - 1), num_segments=out_cap,
        indices_are_sorted=True)

    # columns/rows: compaction sort (segment id -> its last element index),
    # then bulk gathers — cheaper than two more large scatters.
    klast = jnp.where(is_last, seg, _INT32_MAX)
    _, last_e_full = jax.lax.sort(
        (klast, jnp.arange(e_cap, dtype=jnp.int32)), num_keys=1)
    last_e = last_e_full[:out_cap]

    seg_ids = jnp.arange(out_cap, dtype=jnp.int32)
    seg_valid = seg_ids < nnz_c
    if fused:
        key_g = key_s[last_e]
        rows_c = key_g // n
        cols_c = key_g - rows_c * n
    else:
        rows_c = i_s2[last_e]
        cols_c = j_s2[last_e]
    c_val = jnp.where(seg_valid, c_val_full, 0).astype(val_dtype)
    c_col = jnp.where(seg_valid, cols_c, n).astype(jnp.int32)
    rows_m = jnp.where(seg_valid, rows_c, m).astype(jnp.int32)

    row_ptr = jnp.searchsorted(
        rows_m, jnp.arange(m + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return row_ptr, c_col, c_val, nnz_c


def spgemm_csr(A: CSR, B: CSR, plan: SpGEMMPlan | None = None) -> CSR:
    """C = A @ B with both operands CSR. The TPU analogue of the reference's
    CSR_MUL_CSR (csr/common_csr.h:85-193)."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    if plan is None:
        plan = plan_spgemm(A, B)
    a_row = entry_rows(A.row_ptr, A.capacity)
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
