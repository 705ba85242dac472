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


# Single-slab workspace ceiling: expansions above this many intermediate
# products are row-sliced (the reference caps its ESC workspace at
# min(expansion, 16M, freemem/3) and slices rows to fit,
# coo_dev/common_coo_dev.h:326-337,388-421). 2^28 products keep the sort
# pipeline's live arrays within a v5e's 16 GB HBM with headroom; int32
# position arithmetic additionally requires slab E < 2^31.
DEFAULT_WORKSPACE_ELEMS = 1 << 28


@dataclasses.dataclass(frozen=True)
class SpGEMMPlan:
    """Static capacities for one (A, B) SpGEMM problem."""
    expansion_capacity: int   # >= E of a slab (number of products)
    out_capacity: int         # >= nnz(C) of a slab
    flops: int                # exact total E — the reference's GetFlop(A, B)
    # "gather": per-product packed gather into an exact-size expansion
    # (~9 ns/product on v5e). "rowexpand": ONE row-gather of B's padded
    # ELL row per A entry (~10 ns/entry) into a (nnzA, run) expansion —
    # chosen when the pow2-run padding inflates the sort by <= 2x.
    variant: str = "gather"
    b_run: int = 0            # pow2 B-row width for the rowexpand variant
    # Workspace slicing (reference: sliced ESC, coo_dev:388-450): row
    # boundaries [0, r1, ..., m] such that each slab's expansion fits the
    # workspace; None = single slab. All slabs share one compiled shape:
    # rows_capacity rows, nnza_capacity entries, expansion/out capacity.
    slabs: tuple | None = None
    rows_capacity: int = 0    # max rows per slab (padded)
    nnza_capacity: int = 0    # max A entries per slab (padded)
    total_out_capacity: int = 0  # >= nnz(C) overall (sliced only)


def plan_spgemm(A: CSR, B: CSR, *, bucket: bool = True,
                workspace_elems: int | None = None) -> SpGEMMPlan:
    """Symbolic pass: exact expansion size (the reference's phase-1 nnz
    upper bound, csr/common_csr.h:100-125). The per-row reduction runs on
    device (ops/symbolic.py); only (m,) row counts come back to the host
    planner — not the O(nnz) index arrays.

    Expansions beyond `workspace_elems` (default DEFAULT_WORKSPACE_ELEMS,
    always capped below int32) get a sliced plan: greedy row slabs whose
    per-slab expansion fits, mirroring the reference's upper_bound search
    over cumulative_row_workspace (coo_dev/common_coo_dev.h:388-421)."""
    from ia_spgemm_tpu.ops import symbolic
    ws = workspace_elems or DEFAULT_WORKSPACE_ELEMS
    ws = min(ws, np.iinfo(np.int32).max - 1)
    # bucket_capacity rounds UP (<=25%): cap ws so even the bucketed
    # capacity stays below int32 positions (a ws near 2^31 would
    # otherwise let bucket_capacity(E) overflow the position arithmetic)
    while cfg.bucket_capacity(ws) > np.iinfo(np.int32).max - 1:
        ws -= max(ws // 16, 1)
    E, out_bound, max_rf, rf = symbolic.plan_symbolic(A, B,
                                                      return_rows=True)
    # host diff of the (m+1)-sized row_ptr: one small D2H instead of a
    # blocking device reduction right after plan_symbolic's host pass
    b_maxlen = int(np.diff(np.asarray(B.row_ptr)).max(initial=0))
    run = 1 << max(b_maxlen - 1, 0).bit_length()
    if E > ws:
        if max_rf > ws:
            raise ValueError(
                f"a single row expands to {max_rf} products, beyond the "
                f"{ws}-element workspace; row-partition the problem "
                "(ia_spgemm_tpu.parallel) or raise workspace_elems")
        # greedy slabs over the row-flops prefix sum: searchsorted per
        # SLAB (the reference's upper_bound over
        # cummulative_row_workspace, coo_dev:388-421), not a Python
        # iteration per ROW
        csum = np.concatenate([[0], np.cumsum(rf, dtype=np.int64)])
        bounds = [0]
        while bounds[-1] < len(rf):
            r0 = bounds[-1]
            r1 = int(np.searchsorted(csum, csum[r0] + ws, side="right")) - 1
            bounds.append(max(r1, r0 + 1))  # max_rf<=ws ⇒ r1>r0 normally
        slabs = tuple(bounds)
        spans = [(slabs[i], slabs[i + 1]) for i in range(len(slabs) - 1)]
        row_ptr = np.asarray(A.row_ptr, dtype=np.int64)
        slab_E = max(int(rf[r0:r1].sum()) for r0, r1 in spans)
        slab_out = max(int(np.minimum(rf[r0:r1], B.ncols).sum())
                       for r0, r1 in spans)
        slab_nnz = max(int(row_ptr[r1] - row_ptr[r0]) for r0, r1 in spans)
        slab_rows = max(r1 - r0 for r0, r1 in spans)
        total_out = int(np.minimum(rf, B.ncols).sum())
        if total_out >= np.iinfo(np.int32).max:
            raise ValueError(
                f"output bound {total_out} overflows int32 positions; "
                "row-partition the problem (ia_spgemm_tpu.parallel)")
        return SpGEMMPlan(
            expansion_capacity=cfg.bucket_capacity(slab_E, enabled=bucket),
            out_capacity=cfg.bucket_capacity(slab_out or 1, enabled=bucket),
            flops=E, variant="gather", b_run=0, slabs=slabs,
            rows_capacity=cfg.bucket_capacity(slab_rows, enabled=bucket),
            nnza_capacity=cfg.bucket_capacity(slab_nnz or 1,
                                              enabled=bucket),
            total_out_capacity=cfg.bucket_capacity(total_out or 1,
                                                   enabled=bucket))
    e_cap = cfg.bucket_capacity(E, enabled=bucket)
    out_cap = cfg.bucket_capacity(out_bound or 1, enabled=bucket)
    # rowexpand when the (nnzA_cap, pow2-run) layout inflates the sort
    # by <= 2x — it replaces per-product gathers with per-entry row
    # gathers (~19x fewer gather indices at avg B-row length 19)
    variant, b_run = "gather", 0
    # (f32 only: the padded grid reorders duplicate summation, which the
    # fp64 golden tests pin to segment_sum order)
    if (b_maxlen > 0 and A.capacity * run <= 2 * e_cap
            and A.values.dtype == jnp.float32
            and B.values.dtype == jnp.float32):
        variant, b_run = "rowexpand", run
        e_cap = A.capacity * run
    return SpGEMMPlan(expansion_capacity=e_cap, out_capacity=out_cap,
                      flops=E, variant=variant, b_run=b_run)


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


def _delta_broadcast(cols, positions, out_size: int):
    """Broadcast per-segment constants to every covered position, exactly,
    with NO gathers: scatter-ADD each entry's wraparound int32 delta
    (cols[t] - cols[t-1]) at its segment start, then cumsum.

    The telescoping sum reproduces cols[t] bit-exactly at every position
    covered by segment t — int32 addition is modular, so overflow (and
    float32 payloads carried as bitcast lanes) cancels exactly. Entries of
    zero length share a start position with the next entry; their deltas
    accumulate there and still telescope. This replaces the per-element
    `x[t]` gathers (~9 ns/element on v5e) with one small scatter plus
    cumsums (~0.1 ns/element).

    cols: (nnzA_cap, C) int32 per-entry values; positions: (nnzA_cap,)
    non-decreasing segment starts (== out_size for entries past the end).
    Positions at/after out_size fall into a dropped tail row.
    """
    nnz_cap = cols.shape[0]
    first = cols[:1]
    deltas = jnp.concatenate([first, cols[1:] - cols[:-1]], axis=0)
    pos = jnp.minimum(positions, out_size)
    buf = jnp.zeros((out_size + 1, cols.shape[1]), jnp.int32)
    buf = buf.at[pos].add(deltas, mode="drop")
    return jnp.cumsum(buf[:out_size], axis=0)


def _expand_products(a_row, a_col_local, a_val, ent_active,
                     b_row_ptr, b_col, b_val, *, e_cap: int):
    """Numeric expand: materialize intermediate products (i, j, a*b).

    a_row/a_col_local/a_val: (nnzA_cap,) per stored A entry — row, LOCAL
    B-row index (already clipped into [0, len(b_row_ptr)-2]), value;
    ent_active masks which entries participate. a_row must be
    non-decreasing over active entries. Returns (i, j, v, valid) padded to
    e_cap, products in A-entry order.
    """
    nnzA_cap = a_col_local.shape[0]
    val_dtype = jnp.result_type(a_val.dtype, b_val.dtype)
    ent = jnp.arange(nnzA_cap, dtype=jnp.int32)

    b_start = b_row_ptr[a_col_local]
    b_len = jnp.where(ent_active, b_row_ptr[a_col_local + 1] - b_start, 0)
    offs_end = jnp.cumsum(b_len, dtype=jnp.int32)
    E = offs_end[-1] if nnzA_cap else jnp.int32(0)
    offs_start = offs_end - b_len

    e = jnp.arange(e_cap, dtype=jnp.int32)
    valid = e < E
    if a_val.dtype == jnp.float32:
        # Per-segment constants [row, value-bits, b_start - offs_start]
        # broadcast by scatter-delta + cumsum (no gathers).
        cols = jnp.stack(
            [a_row, jax.lax.bitcast_convert_type(a_val, jnp.int32),
             b_start - offs_start], axis=1)
        bcast = _delta_broadcast(cols, offs_start, e_cap)
        i = bcast[:, 0]
        av_t = jax.lax.bitcast_convert_type(bcast[:, 1], jnp.float32)
        bpos = bcast[:, 2] + e
    else:
        # non-f32 (fp64 CPU path): per-element gathers at the covering
        # segment t (scatter-max + cummax lookup).
        active = b_len > 0
        t = _segment_broadcast(ent + 1, offs_start, active, e_cap,
                               jnp.int32(0)) - 1
        t = jnp.clip(t, 0, nnzA_cap - 1)
        i = a_row[t]
        av_t = a_val[t]
        bpos = b_start[t] + (e - offs_start[t])
    bpos = jnp.clip(bpos, 0, b_col.shape[0] - 1)
    j, bv = _packed_gather2(b_col, b_val, bpos)
    v = jnp.where(valid, av_t.astype(val_dtype) * bv.astype(val_dtype), 0)
    return i, j, v, valid


def _segmented_scan_add(v, head):
    """Inclusive prefix sums that reset at `head` positions: a manual
    Hillis–Steele log-step scan (ceil(log2 n) elementwise passes).

    jax.lax.associative_scan's recursive odd/even decomposition produces
    pathological layouts at multi-million element sizes on TPU (observed
    minutes-long compiles); this unrolled form compiles in seconds and is
    pure VPU work. Each run is combined in balanced-tree order, so accuracy
    matches a per-run tree reduction (no global-cumsum cancellation).
    """
    s = v
    f = head
    size = s.shape[0]
    d = 1
    while d < size:
        s_sh = jnp.concatenate([jnp.zeros(d, s.dtype), s[:-d]])
        f_sh = jnp.concatenate([jnp.ones(d, f.dtype), f[:-d]])
        s = jnp.where(f, s, s + s_sh)
        f = f | f_sh
        d *= 2
    return s


def _sort_compress(i, j, v, valid, *, out_cap: int, m: int, n: int):
    """Sort products by (i, j) and compress duplicates.

    Returns (row_ptr, col_ind, values, nnz) of the compressed result,
    padded to out_cap (cols past nnz get sentinel n, values 0).
    """
    e_cap = v.shape[0]
    val_dtype = v.dtype
    if out_cap > e_cap:
        # tiny problems: the expansion can be smaller than the bucketed
        # output capacity; pad so the [:out_cap] compaction slices hold
        pad = out_cap - e_cap
        i = jnp.pad(i, (0, pad))
        j = jnp.pad(j, (0, pad))
        v = jnp.pad(v, (0, pad))
        valid = jnp.pad(valid, (0, pad))
        e_cap = out_cap

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

    # ---- compress: run boundaries + segmented scan + compaction sort ----
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

    # values: segmented inclusive scan (prefix sums that RESET at run
    # heads). Unlike a global cumsum-difference (whose error scales with
    # the global running sum — measured 27x relative error in f32), each
    # run is tree-summed in isolation, matching segment_sum's accuracy at
    # ~1/9 the cost (segment_sum lowers to a ~9 ns/element scatter).
    if val_dtype == jnp.float64:
        # fp64 CPU/oracle path: keep segment_sum's summation order (the
        # golden tests assert 1e-12 absolute agreement with scipy).
        sums = jax.ops.segment_sum(
            v_s, jnp.clip(seg, 0, e_cap - 1), num_segments=e_cap,
            indices_are_sorted=True)
        run_pref = sums[jnp.clip(seg, 0, e_cap - 1)]
    else:
        run_pref = _segmented_scan_add(v_s, head)

    # compaction: one more sort moves each run's LAST element (carrying the
    # completed run sum) to position seg — cheaper than scatters or
    # index-gathers at this size.
    key2 = jnp.where(is_last, seg, _INT32_MAX)
    seg_ids = jnp.arange(out_cap, dtype=jnp.int32)
    seg_valid = seg_ids < nnz_c
    if fused:
        _, key_c, val_c = jax.lax.sort((key2, key_s, run_pref), num_keys=1)
        key_c = key_c[:out_cap]
        val_c = val_c[:out_cap]
        rows_c = key_c // n
        cols_c = key_c - rows_c * n
    else:
        _, rows_c, cols_c, val_c = jax.lax.sort(
            (key2, i_s2, j_s2, run_pref), num_keys=1)
        rows_c = rows_c[:out_cap]
        cols_c = cols_c[:out_cap]
        val_c = val_c[:out_cap]
    c_val = jnp.where(seg_valid, val_c, 0).astype(val_dtype)
    c_col = jnp.where(seg_valid, cols_c, n).astype(jnp.int32)
    rows_m = jnp.where(seg_valid, rows_c, m).astype(jnp.int32)

    row_ptr = jnp.searchsorted(
        rows_m, jnp.arange(m + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return row_ptr, c_col, c_val, nnz_c


@functools.partial(
    jax.jit,
    static_argnames=("e_cap", "out_cap", "m", "n", "k"))
def _esc_core(a_row, a_col, a_val, a_nnz,
              b_row_ptr, b_col, b_val,
              *, e_cap: int, out_cap: int, m: int, k: int, n: int):
    """Format-agnostic ESC core over A's entry list: expand then
    sort-compress. Returns (row_ptr, col_ind, values, nnz) of C = A @ B,
    padded to out_cap."""
    nnzA_cap = a_col.shape[0]
    ent_valid = jnp.arange(nnzA_cap, dtype=jnp.int32) < a_nnz
    a_col_c = jnp.clip(a_col, 0, k - 1)
    i, j, v, valid = _expand_products(
        a_row, a_col_c, a_val, ent_valid, b_row_ptr, b_col, b_val,
        e_cap=e_cap)
    return _sort_compress(i, j, v, valid, out_cap=out_cap, m=m, n=n)


@functools.partial(jax.jit, static_argnames=("out_cap", "m", "n", "run"))
def _esc_core_rowexpand(a_row, a_col, a_val, a_nnz, b_col_ell, b_val_ell,
                        *, out_cap: int, m: int, n: int, run: int):
    """ESC numeric phase with the B-row-gather expansion: one packed
    row-gather per A entry into a (nnzA_cap, run) product grid (invalid
    slots masked), then the shared sort-compress."""
    nnzA_cap = a_col.shape[0]
    k, kb = b_col_ell.shape
    ent_valid = jnp.arange(nnzA_cap, dtype=jnp.int32) < a_nnz
    rows = jnp.clip(a_col, 0, k - 1)
    bc_p = jnp.pad(b_col_ell, ((0, 0), (0, run - kb)), constant_values=-1)
    bv_p = jnp.pad(b_val_ell, ((0, 0), (0, run - kb)))
    if a_val.dtype == jnp.float32:
        table = jnp.concatenate(
            [bc_p, jax.lax.bitcast_convert_type(bv_p, jnp.int32)], axis=1)
        g = table[rows]                                 # (nnzA_cap, 2*run)
        bc = g[:, :run]
        bv = jax.lax.bitcast_convert_type(g[:, run:], jnp.float32)
    else:
        bc = bc_p[rows]
        bv = bv_p[rows]
    valid = ent_valid[:, None] & (bc >= 0)
    val_dtype = jnp.result_type(a_val.dtype, b_val_ell.dtype)
    i = jnp.broadcast_to(a_row[:, None], (nnzA_cap, run))
    v = jnp.where(valid, a_val[:, None].astype(val_dtype)
                  * bv.astype(val_dtype), 0)
    return _sort_compress(i.reshape(-1), bc.reshape(-1), v.reshape(-1),
                          valid.reshape(-1), out_cap=out_cap, m=m, n=n)


@functools.partial(jax.jit, static_argnames=("rows_cap", "nnza_cap"))
def _slab_inputs(row_ptr, col_ind, values, *, r0, s0, s1,
                 rows_cap: int, nnza_cap: int):
    """Slice one row slab of a CSR into fixed-capacity (rebased) arrays so
    every slab reuses ONE compiled ESC core. Tail rows/entries are padded
    empty."""
    m1 = row_ptr.shape[0] - 1
    rp = jax.lax.dynamic_slice(
        jnp.pad(row_ptr, (0, rows_cap)), (r0,), (rows_cap + 1,))
    rp = jnp.clip(rp - s0, 0, s1 - s0)
    col = jax.lax.dynamic_slice(
        jnp.pad(col_ind, (0, nnza_cap), constant_values=m1), (s0,),
        (nnza_cap,))
    val = jax.lax.dynamic_slice(jnp.pad(values, (0, nnza_cap)), (s0,),
                                (nnza_cap,))
    return rp, col, val


@jax.jit
def _slab_write(col_out, val_out, rp_out, piece_col, piece_val, piece_rp,
                off, r0):
    """Assemble one slab's compressed piece into the (padded) global
    output at host-known offsets — device-side dynamic_update_slice, one
    compiled shape for every slab. Tail-row garbage in piece_rp is
    overwritten by the next slab's correct values; the buffers carry one
    slab of padding so no update ever clamps."""
    col_out = jax.lax.dynamic_update_slice(col_out, piece_col, (off,))
    val_out = jax.lax.dynamic_update_slice(val_out, piece_val, (off,))
    rp_out = jax.lax.dynamic_update_slice(
        rp_out, (piece_rp + off).astype(jnp.int32), (r0,))
    return col_out, val_out, rp_out


def _spgemm_csr_sliced(A: CSR, B: CSR, plan: SpGEMMPlan) -> CSR:
    """Workspace-sliced ESC: run the core per row slab and concatenate —
    the reference's sliced coo_spmm_helper loop
    (coo_dev/common_coo_dev.h:388-450). Slabs share one compiled shape;
    assembly stays on device (dynamic_update_slice at host-known
    offsets); only each slab's scalar nnz is read back."""
    m, n = A.nrows, B.ncols
    row_ptr_h = np.asarray(A.row_ptr, dtype=np.int64)
    total_cap = plan.total_out_capacity
    # one slab of padding so padded piece writes never clamp
    col_out = jnp.full((total_cap + plan.out_capacity,), n, jnp.int32)
    # pieces come back in result_type(A, B): mixed-dtype operands must
    # assemble at that dtype, like the unsliced path
    out_dtype = jnp.result_type(A.values.dtype, B.values.dtype)
    val_out = jnp.zeros((total_cap + plan.out_capacity,), out_dtype)
    rp_out = jnp.zeros((m + 1 + plan.rows_capacity,), jnp.int32)
    off = 0
    slabs = plan.slabs
    for i in range(len(slabs) - 1):
        r0, r1 = slabs[i], slabs[i + 1]
        s0, s1 = int(row_ptr_h[r0]), int(row_ptr_h[r1])
        rp, col, val = _slab_inputs(
            A.row_ptr, A.col_ind, A.values, r0=r0, s0=s0, s1=s1,
            rows_cap=plan.rows_capacity, nnza_cap=plan.nnza_capacity)
        a_row = entry_rows(rp, plan.nnza_capacity)
        prow, pcol, pval, pnnz = _esc_core(
            a_row, col, val, jnp.int32(s1 - s0),
            B.row_ptr, B.col_ind, B.values,
            e_cap=plan.expansion_capacity, out_cap=plan.out_capacity,
            m=plan.rows_capacity, k=A.ncols, n=n)
        col_out, val_out, rp_out = _slab_write(
            col_out, val_out, rp_out, pcol, pval, prow, off, r0)
        off += int(pnnz)
    rp_out = rp_out.at[m].set(off)
    return CSR(row_ptr=rp_out[:m + 1], col_ind=col_out[:total_cap],
               values=val_out[:total_cap], nnz=jnp.int32(off),
               shape=(m, n))


def spgemm_csr(A: CSR, B: CSR, plan: SpGEMMPlan | None = None,
               engine: str = "global") -> CSR:
    """C = A @ B with both operands CSR. The TPU analogue of the reference's
    CSR_MUL_CSR (csr/common_csr.h:85-193). Expansions beyond the workspace
    run the sliced path (see plan_spgemm/_spgemm_csr_sliced).

    engine="global" (default): the global-sort/sliced path — the only
    engine whose EXACT-CSR output is cheap (also the fp64 golden-
    summation-order oracle). engine="slab": the slab-packed VMEM engine
    (ops/slab.py) flattened through slab_to_csr — measured ~17x faster
    to the native SlabCSR (12.5 vs 212 ms device on the headline,
    reports/headline_rooflines.json) but the flattening scatter reads
    the whole padded grid (~600 ms there), so exact-CSR callers should
    prefer engine='global' while SlabCSR-capable consumers (harness,
    acceptance, checksum/to_scipy users) call spgemm_csr_slab and keep
    the native output."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    if engine == "slab":
        from ia_spgemm_tpu.ops import slab as slab_mod
        call = slab_mod.plan_slab_csr(A, B)
        if call is not None:
            return slab_mod.slab_to_csr(call(),
                                        out_cap=call.plan.out_cap)
    if plan is None:
        plan = plan_spgemm(A, B)
    if plan.slabs is not None:
        return _spgemm_csr_sliced(A, B, plan)
    a_row = entry_rows(A.row_ptr, A.capacity)
    if plan.variant == "rowexpand":
        from ia_spgemm_tpu.formats.convert import csr_to_ell
        B_ell = csr_to_ell(B, check_guard=False)
        row_ptr, col, val, nnz = _esc_core_rowexpand(
            a_row, A.col_ind, A.values, A.nnz,
            B_ell.col_ind, B_ell.values,
            out_cap=plan.out_capacity, m=A.nrows, n=B.ncols,
            run=plan.b_run)
    else:
        row_ptr, col, val, nnz = _esc_core(
            a_row, A.col_ind, A.values, A.nnz,
            B.row_ptr, B.col_ind, B.values,
            e_cap=plan.expansion_capacity, out_cap=plan.out_capacity,
            m=A.nrows, k=A.ncols, n=B.ncols)
    return CSR(row_ptr=row_ptr, col_ind=col, values=val, nnz=nnz,
               shape=(A.nrows, B.ncols))


# padded ELL slots allowed per operand for the tiled route (256M slots
# = 2 GB of col+val at f32) — beyond this the conversion itself would
# crowd the 16 GB HBM before the product tiles are even allocated
TILED_ELL_BUDGET_ELEMS = 1 << 28


def plan_csr_tiled(A: CSR, B: CSR, *, out_width: int | None = None):
    """Plan the tiled CSR route ONCE: ELL-convert on device, plan the
    width classes, and return a zero-argument runner producing a
    128-aligned BlockCSR — or None when the route is not viable
    (non-f32, an operand blows the ELL slot budget, or a row's products
    exceed the class planner's width/budget caps).

    The conversion + class planning here is the tiled analogue of
    plan_spgemm's symbolic phase: one-time setup amortized across calls,
    reported by the harness as trans time."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    if (A.values.dtype != jnp.float32
            or B.values.dtype != jnp.float32):
        return None
    from ia_spgemm_tpu.formats import convert
    from ia_spgemm_tpu.ops import bitonic
    ka = convert.plan_ell_width(A)
    kb = convert.plan_ell_width(B)
    if (A.nrows * max(ka, 1) > TILED_ELL_BUDGET_ELEMS
            or B.nrows * max(kb, 1) > TILED_ELL_BUDGET_ELEMS):
        return None
    A_ell = convert.csr_to_ell(A, width=ka, check_guard=False)
    B_ell = convert.csr_to_ell(B, width=kb, check_guard=False)
    return bitonic.multiclass_planned(
        A_ell, B_ell, assemble="bcsr", out_width=out_width)


def spgemm_csr_tiled(A: CSR, B: CSR, *, out_width: int | None = None):
    """CSR-in width-class SpGEMM: sort each row's products at its own
    pow2 width through the Pallas bitonic networks (ops/bitonic.py),
    emit 128-aligned BlockCSR.

    Same expand-sort-compress contract as spgemm_csr, but per-row tiles
    replace the global jax.lax.sort over the flat 2*E stream (measured
    ~25x off HBM bandwidth at multi-million E on v5e — the reference's
    Thrust ESC, csr_dev/common_csr_dev.h:134-254, leans on exactly such
    global sorts because GPU merge sorts are fast; TPU-first means
    keeping the sort inside VMEM tiles). Returns None when not viable —
    callers fall back to the global-sort / sliced spgemm_csr."""
    call = plan_csr_tiled(A, B, out_width=out_width)
    return call() if call is not None else None


# Calibrated per-engine device-time model (VERDICT r4 #4: route skewed
# inputs to the engine that actually wins). Constants are ns per padded
# sort slot / per intermediate product, measured on TPU v5e against the
# round-4 artifacts (BENCH_r04.json, reports/headline_rooflines.json):
#   multiclass  7.27 ms / 18.67 M slots (headline)          -> 0.39 ns
#   wide (>1024-lane, rows-layout) multiclass classes run ~2.5x the
#   capped classes' per-slot rate (skew: 12.28 ms measured vs 6.8 ms
#   at the flat rate; the residual is the 332x16384 rows-layout class)
#   slab        8.52 ms / 17.82 M padded slots (headline)   -> 0.48 ns
#   global sort 245 ms  / 9.47 M products (headline)        -> 26 ns
_NS_PER_SLOT_MC = 0.39
_NS_PER_SLOT_MC_WIDE = 1.0
_NS_PER_SLOT_SLAB = 0.48
_NS_PER_PRODUCT_GLOBAL = 26.0
_SLAB_PACK_OVERHEAD = 1.1      # slab-boundary padding over sum(prf)


def predict_csr_route_ms(A: CSR, B: CSR):
    """Predict device time (ms) per viable CSR engine from host-side
    stats (nnz-scaled numpy; no device work). Returns a dict
    {route: predicted_ms} over 'tiled', 'slab', 'hybrid', 'global' —
    only the routes whose cheap viability pre-checks pass. 'global' is
    always present (the engine every fallback rests on)."""
    from ia_spgemm_tpu.ops import bitonic
    from ia_spgemm_tpu.ops import slab as slab_mod
    from ia_spgemm_tpu.utils import hostcache

    nnzA = int(A.nnz)
    out = {}
    if nnzA == 0 or int(B.nnz) == 0:
        return {"global": 0.0}
    a_rp = hostcache.host_view(A.row_ptr).astype(np.int64)
    a_col = hostcache.host_view(A.col_ind)[:nnzA].astype(np.int64)
    b_len = np.diff(hostcache.host_view(B.row_ptr)).astype(np.int64)
    e_len = b_len[np.clip(a_col, 0, B.nrows - 1)]
    E = int(e_len.sum())
    out["global"] = E * _NS_PER_PRODUCT_GLOBAL * 1e-6

    if A.values.dtype != jnp.float32 or B.values.dtype != jnp.float32:
        return out    # sort engines are f32-only

    def padded_row_products(run):
        frag = -(-e_len // run)
        ecs = np.concatenate([[0], np.cumsum(frag)])
        return (ecs[a_rp[1:]] - ecs[a_rp[:-1]]) * run

    # --- tiled multiclass (ragged run=16, per-row pow2 widths) ---
    ka = int(np.max(np.diff(a_rp), initial=0))
    kb = int(b_len.max(initial=0))
    if (A.nrows * max(ka, 1) <= TILED_ELL_BUDGET_ELEMS
            and B.nrows * max(kb, 1) <= TILED_ELL_BUDGET_ELEMS):
        p16 = padded_row_products(16)
        W = np.maximum(128, 2 ** np.ceil(
            np.log2(np.maximum(p16, 128))).astype(np.int64))
        if (int(W.max(initial=128)) <= bitonic.MAX_WIDTH
                and int(W.sum()) * 8 <= bitonic.PRODUCT_BUDGET_BYTES):
            wide = W > 1024
            out["tiled"] = (float(W[~wide].sum()) * _NS_PER_SLOT_MC
                            + float(W[wide].sum())
                            * _NS_PER_SLOT_MC_WIDE) * 1e-6

    # --- slab engine / slab+global hybrid (run=32, 1024-lane cap) ---
    p32 = padded_row_products(slab_mod.DEFAULT_RUN)
    heavy = p32 > slab_mod.SLAB_MAX_WIDTH
    n_heavy = int(heavy.sum())
    v_light = float(p32[~heavy].sum()) * _SLAB_PACK_OVERHEAD
    t_light = v_light * _NS_PER_SLOT_SLAB * 1e-6
    if n_heavy == 0:
        out["slab"] = t_light
    elif n_heavy < A.nrows:
        e_heavy = float(e_len[np.repeat(heavy, np.diff(a_rp))].sum())
        out["hybrid"] = t_light + e_heavy * _NS_PER_PRODUCT_GLOBAL * 1e-6
    return out


def plan_csr_auto(A: CSR, B: CSR, plan: SpGEMMPlan | None = None,
                  bucket=True):
    """Plan the production CSR @ CSR route: predict each viable engine's
    device time (predict_csr_route_ms) and construct the cheapest one,
    falling through to the next candidate when a full planner declines
    (the cheap pre-checks are a superset, not a proof, of viability).

    Returns (route_name, zero-arg runner). The runner returns BlockCSR
    (tiled), SlabCSR (slab), HybridCSR (hybrid) or CSR (global) — all
    satisfy the checksum/to_scipy result contract."""
    from ia_spgemm_tpu.ops import slab as slab_mod
    pred = predict_csr_route_ms(A, B)
    for route in sorted(pred, key=pred.get):
        if route == "tiled":
            call = plan_csr_tiled(A, B)
        elif route == "slab":
            call = slab_mod.plan_slab_csr(A, B)
        elif route == "hybrid":
            call = slab_mod.plan_slab_hybrid(A, B)
        else:
            esc_plan = plan if plan is not None \
                else plan_spgemm(A, B, bucket=bucket)
            return "global", lambda: spgemm_csr(A, B, esc_plan)
        if call is not None:
            return route, call
    raise AssertionError("unreachable: 'global' is always a candidate")


def spgemm_csr_auto(A: CSR, B: CSR, plan: SpGEMMPlan | None = None):
    """Production CSR @ CSR entry point: the reference's CSR_MUL_CSR
    role (csr/common_csr.h:85-193) with the engine choice made
    internally by a calibrated cost model (plan_csr_auto): tiled
    width-class sort, slab-packed ESC, slab+global hybrid (skewed
    inputs, VERDICT r4 #4), or global-sort/workspace-sliced ESC.
    Returns BlockCSR/SlabCSR/HybridCSR/CSR by route; all satisfy the
    checksum/to_scipy result contract."""
    _route, call = plan_csr_auto(A, B, plan)
    return call()


# ---------------------------------------------------------------------------
# Compensated (double-double) variant — fp64-grade accumulation on f32 TPUs
# ---------------------------------------------------------------------------

def _ob(x):
    """Optimization barrier: XLA here runs with allow_excess_precision,
    whose algebraic simplifier cancels error-recovery sequences like
    (a + b) - b (measured: the dd path degraded to plain-f32 accuracy on
    TPU without these). Barriers pin the rounded intermediates."""
    return jax.lax.optimization_barrier(x)


def _two_sum(a_hi, a_lo, b_hi, b_lo):
    """Double-double addition (Knuth two-sum + renormalize): exact to
    ~2^-48 relative, using only f32 ops the VPU has."""
    s = _ob(a_hi + b_hi)
    bp = _ob(s - a_hi)
    err = (a_hi - _ob(s - bp)) + (b_hi - bp)
    lo = err + a_lo + b_lo
    hi = _ob(s + lo)
    return hi, lo - (hi - s)


def _two_product(a, b):
    """Dekker two-product (no FMA needed): a*b = hi + lo exactly."""
    split = jnp.asarray(4097.0, a.dtype)  # 2^12 + 1 for f32
    a1 = _ob(a * split)
    ah = _ob(a1 - (a1 - a))
    al = a - ah
    b1 = _ob(b * split)
    bh = _ob(b1 - (b1 - b))
    bl = b - bh
    p = _ob(a * b)
    e = ((_ob(ah * bh) - p) + _ob(ah * bl) + _ob(al * bh)) + al * bl
    return p, e


@jax.jit
def dd_sum(hi, lo):
    """Exact-grade total of a double-double array ON DEVICE: pairwise
    folding under two-sum (log2(n) halving passes), returning a (hi, lo)
    scalar pair. Error matches a balanced-tree dd reduction (~2^-48
    relative) — the host only reads back 8 bytes."""
    n = hi.shape[0]
    p = 1 << max(n - 1, 0).bit_length()
    if p != n:
        hi = jnp.pad(hi, (0, p - n))
        lo = jnp.pad(lo, (0, p - n))
    while p > 1:
        half = p // 2
        hi, lo = _two_sum(hi[:half], lo[:half], hi[half:], lo[half:])
        p = half
    return hi[0], lo[0]


def _segmented_scan_two_sum(hi, lo, head):
    """Segmented Hillis–Steele scan under double-double addition."""
    f = head
    size = hi.shape[0]
    d = 1
    while d < size:
        hi_sh = jnp.concatenate([jnp.zeros(d, hi.dtype), hi[:-d]])
        lo_sh = jnp.concatenate([jnp.zeros(d, lo.dtype), lo[:-d]])
        f_sh = jnp.concatenate([jnp.ones(d, f.dtype), f[:-d]])
        nhi, nlo = _two_sum(hi, lo, hi_sh, lo_sh)
        hi = jnp.where(f, hi, nhi)
        lo = jnp.where(f, lo, nlo)
        f = f | f_sh
        d *= 2
    return hi, lo


@functools.partial(
    jax.jit, static_argnames=("e_cap", "out_cap", "m", "n", "k"))
def _esc_core_dd(a_row, a_col, a_val, a_nnz, b_row_ptr, b_col, b_val,
                 *, e_cap: int, out_cap: int, m: int, k: int, n: int):
    """ESC with double-double products and run sums: every intermediate
    product is an exact (hi, lo) pair (Dekker) and duplicate runs combine
    under two-sum, so the accumulated values carry ~2^-48 relative error —
    fp64-grade results from an f32-only chip. ~1.6x the plain-f32 cost
    (one extra sort payload + ~10 extra flops/element in the scan)."""
    nnzA_cap = a_col.shape[0]
    ent_valid = jnp.arange(nnzA_cap, dtype=jnp.int32) < a_nnz
    a_col_c = jnp.clip(a_col, 0, k - 1)
    # expand the FACTORS (not the rounded product): the delta-broadcast
    # carries A's value bits, the packed gather brings B's, and Dekker's
    # two-product keeps the exact (hi, lo) per intermediate product
    b_start = b_row_ptr[a_col_c]
    b_len = jnp.where(ent_valid, b_row_ptr[a_col_c + 1] - b_start, 0)
    offs_end = jnp.cumsum(b_len, dtype=jnp.int32)
    E = offs_end[-1] if nnzA_cap else jnp.int32(0)
    offs_start = offs_end - b_len
    cols = jnp.stack(
        [a_row, jax.lax.bitcast_convert_type(a_val, jnp.int32),
         b_start - offs_start], axis=1)
    bcast = _delta_broadcast(cols, offs_start, e_cap)
    e = jnp.arange(e_cap, dtype=jnp.int32)
    valid = e < E
    i = bcast[:, 0]
    av_t = jax.lax.bitcast_convert_type(bcast[:, 1], jnp.float32)
    bpos = jnp.clip(bcast[:, 2] + e, 0, b_col.shape[0] - 1)
    j, bv = _packed_gather2(b_col, b_val, bpos)
    hi, lo = _two_product(av_t, bv)
    hi = jnp.where(valid, hi, 0.0)
    lo = jnp.where(valid, lo, 0.0)

    if out_cap > e_cap:
        pad = out_cap - e_cap
        i = jnp.pad(i, (0, pad))
        j = jnp.pad(j, (0, pad))
        hi = jnp.pad(hi, (0, pad))
        lo = jnp.pad(lo, (0, pad))
        valid = jnp.pad(valid, (0, pad))

    key = jnp.where(valid, i * n + j, jnp.int32(m * n))
    key_s, hi_s, lo_s = jax.lax.sort((key, hi, lo), num_keys=1)
    valid_s = key_s < m * n
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), key_s[:-1]])
    nxt = jnp.concatenate([key_s[1:], jnp.full(1, -1, jnp.int32)])
    head = valid_s & (key_s != prev)
    is_last = valid_s & (key_s != nxt)
    seg = jnp.cumsum(head, dtype=jnp.int32) - 1
    nnz_c = jnp.sum(head, dtype=jnp.int32)

    rhi, rlo = _segmented_scan_two_sum(hi_s, lo_s, head)

    key2 = jnp.where(is_last, seg, _INT32_MAX)
    _, key_c, hi_c, lo_c = jax.lax.sort((key2, key_s, rhi, rlo),
                                        num_keys=1)
    key_c = key_c[:out_cap]
    hi_c = hi_c[:out_cap]
    lo_c = lo_c[:out_cap]
    seg_valid = jnp.arange(out_cap, dtype=jnp.int32) < nnz_c
    rows_c = key_c // n
    cols_c = key_c - rows_c * n
    c_hi = jnp.where(seg_valid, hi_c, 0.0)
    c_lo = jnp.where(seg_valid, lo_c, 0.0)
    c_col = jnp.where(seg_valid, cols_c, n).astype(jnp.int32)
    rows_m = jnp.where(seg_valid, rows_c, m).astype(jnp.int32)
    row_ptr = jnp.searchsorted(
        rows_m, jnp.arange(m + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return row_ptr, c_col, c_hi, c_lo, nnz_c


def spgemm_csr_compensated(A: CSR, B: CSR,
                           plan: SpGEMMPlan | None = None,
                           engine: str = "auto"):
    """C = A @ B with double-double accumulation: f32 operands, fp64-grade
    sums (~2^-48 relative). The result stays ON DEVICE as a (values,
    values_lo) f32 pair — hi + lo is exact in float64; combine with
    values_f64()/to_scipy on the host or reduce with dd_sum on device.
    (Round 1 combined on the host eagerly — an 84 MB D2H pull that made
    this path 68x slower than plain ESC.)

    engine: 'auto' runs the compensated SLAB pipeline when viable
    (VERDICT r4 #6: two-value-lane VMEM sort + two-sum compress at
    slab-engine bandwidth, returning SlabCSR with values_lo) and the
    global-sort core otherwise; 'global' forces the CSR-returning
    global path. An explicitly provided sliced plan still raises — the
    global core does not slice.

    Requires the fused int32 key (m*n < 2^31) — covered by all reference
    workloads; fall back to the fp64 CPU path otherwise.
    """
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    if (A.nrows + 1) * (B.ncols + 1) >= 2**31:
        raise ValueError("compensated path needs m*n < 2^31")
    if A.values.dtype != jnp.float32:
        raise ValueError("compensated path takes float32 operands")
    if plan is not None and plan.slabs is not None:
        # an explicitly sliced plan is a contract error regardless of
        # engine — the caller sized capacities per-slab
        raise ValueError(
            f"expansion {plan.flops} exceeds the single-slab workspace "
            "and the compensated path does not slice; raise "
            "workspace_elems in plan_spgemm or row-partition "
            "(ia_spgemm_tpu.parallel)")
    if engine == "auto":
        from ia_spgemm_tpu.ops import slab as slab_mod
        call = slab_mod.plan_slab_csr(A, B, dd=True)
        if call is not None:
            return call()
    if plan is None:
        plan = plan_spgemm(A, B)
    if plan.slabs is not None:
        # a sliced plan's capacities are PER-SLAB; running the whole
        # matrix against them would silently truncate the expansion
        raise ValueError(
            f"expansion {plan.flops} exceeds the single-slab workspace "
            "and the compensated path does not slice; raise "
            "workspace_elems in plan_spgemm or row-partition "
            "(ia_spgemm_tpu.parallel)")
    a_row = entry_rows(A.row_ptr, A.capacity)
    e_cap = (plan.expansion_capacity if plan.variant == "gather"
             else cfg.bucket_capacity(plan.flops))
    row_ptr, col, hi, lo, nnz = _esc_core_dd(
        a_row, A.col_ind, A.values, A.nnz,
        B.row_ptr, B.col_ind, B.values,
        e_cap=e_cap, out_cap=plan.out_capacity,
        m=A.nrows, k=A.ncols, n=B.ncols)
    return CSR(row_ptr=row_ptr, col_ind=col, values=hi, values_lo=lo,
               nnz=nnz, shape=(A.nrows, B.ncols))


def spgemm_coo(A: COO, B: COO, plan: SpGEMMPlan | None = None) -> COO:
    """C = A @ B with both operands COO. The reference's COO_MUL_COO uses
    linear probing into the output row (coo/common_coo.h:72-161); here the
    same products go through the ESC core using A's materialized row_ind."""
    from ia_spgemm_tpu.formats.convert import coo_to_csr, csr_to_coo
    if plan is None:
        plan = plan_spgemm(coo_to_csr(A), coo_to_csr(B))
    if plan.slabs is not None:
        # sliced plans carry PER-SLAB capacities; a single whole-matrix
        # core call would silently truncate — run the sliced CSR engine
        # and convert back instead
        C = _spgemm_csr_sliced(coo_to_csr(A), coo_to_csr(B), plan)
        return csr_to_coo(C)
    row_ptr, col, val, nnz = _esc_core(
        A.row_ind, A.col_ind, A.values, A.nnz,
        B.row_offset, B.col_ind, B.values,
        e_cap=plan.expansion_capacity, out_cap=plan.out_capacity,
        m=A.nrows, k=A.ncols, n=B.ncols)
    return csr_to_coo(CSR(row_ptr=row_ptr, col_ind=col, values=val, nnz=nnz,
                          shape=(A.nrows, B.ncols)))
