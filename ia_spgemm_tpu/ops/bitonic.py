"""Row-local bitonic SpGEMM — the flagship TPU kernel.

C = A @ B with both operands ELL. The reference's row-wise kernels
accumulate each output row independently (CSR linked lists,
csr/common_csr.h:130-189; ELL masks, ell/common_ell.h:134-187; COO linear
probing, coo/common_coo.h:124-159). The TPU-native form of "one output row
at a time" is: materialize each row's intermediate products into a fixed
lane width, then sort-and-compress the row ENTIRELY IN VMEM with a bitonic
network — compare-exchange is pure VPU work (lane rotates + selects), so
the only HBM traffic is one read of the products and one write of the
result.

This sidesteps the two TPU costs that bound the global-sort ESC path
(ops/esc.py): per-element random access (~9 ns/element on v5e — here B is
fetched with ONE row-gather per A entry at ~10 ns per ROW of Kb elements)
and the O(E log E) global XLA sort (~6 ns/element — here each row's
products sort at VPU throughput without leaving VMEM).

Pipeline:
  1. expand (XLA): row-gather B's ELL rows at A's column indices from a
     single 2-D packed (col|value-bits) table with FLAT indices (the 3-D
     gather form costs ~50x more), outer-multiply by A's values, pad each
     B-run to a pow2 length and REVERSE every odd run -> the (m, width)
     product rows arrive as alternating ascending/descending sorted runs.
  2. sort (Pallas): the bitonic network starts at round 2*run — the first
     log2(run) rounds are skipped because step 1 pre-sorted the runs.
  3. compress (Pallas): a segmented scan sums duplicate runs; survivors
     are compacted left with an omega-network route (log2(width) stages,
     LSB->MSB; monotone destinations self-route without collisions) —
     ~5x fewer stages than a second bitonic sort.

Viability: m*width values must fit the product-buffer budget and width
<= 16384 lanes; the planner rejects skewed matrices (huge Ka*Kb) — the
role the reference's 50x size guards play (dia/common_dia.h:56) — and the
autotuner falls back to the ESC path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ia_spgemm_tpu.formats.types import ELL

SENTINEL = np.int32(np.iinfo(np.int32).max)

# per-tile VMEM element budget (keys+values+temps for ~10 live (R, Wp)
# arrays at 4 B each; 256K elements OOM'd the 16 MB scoped VMEM; 32K
# measured fastest at width 1024 on v5e)
_TILE_ELEMS = 32 * 1024
MAX_WIDTH = 16384
# static-stride (fully unrolled) networks run ~25% faster than dynamic
# strides but compile cost grows with stages*registers; cap by width
STATIC_STRIDE_MAX_WIDTH = 4096
# product-buffer budget: m * Wp * 8 bytes (key + value)
PRODUCT_BUDGET_BYTES = 4 << 30


@dataclasses.dataclass(frozen=True)
class BitonicPlan:
    width: int        # Wp — padded products per row (pow2, >=128)
    run: int          # pow2 sorted-run length (B-row CHUNK size)
    tile_rows: int    # R — rows per Pallas tile
    viable: bool
    reason: str = ""
    # sub-run splitting: B rows are cut into `chunks` pieces of `run`
    # slots each (chunks * run >= kb). chunks=1 is the unsplit layout.
    # Splitting trades more gather indices (ka*chunks vs ka) for a
    # smaller pow2 width when kb sits just past a power of two — e.g.
    # kb=40 pads to run 64 unsplit (width 4096 at ka=33) but to 3 chunks
    # of 16 split (1584 -> width 2048): half the sort work.
    chunks: int = 1


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def plan_bitonic_dims(m: int, ka: int, kb: int,
                      allow_split: bool = True) -> BitonicPlan:
    """Plan from dimensions only (probe before converting to ELL).

    Searches pow2 sub-run lengths run0 <= next_pow2(kb); a smaller run0
    is chosen only when it strictly lowers the padded width (sort work
    scales with width; the extra sort rounds and gather indices are
    second-order). Among widths, the largest run0 wins (fewest gathers).
    """
    full_run = max(1, _next_pow2(kb))
    best = None  # (width, -run0, run0, chunks)
    run0 = full_run
    while True:
        chunks = -(-max(kb, 1) // run0) if kb else 1
        width = max(128, _next_pow2(ka * chunks * run0))
        cand = (width, -run0, run0, chunks)
        if best is None or cand < best:
            best = cand
        if run0 <= 8 or not allow_split:
            break
        run0 //= 2
    width, _, run, chunks = best
    run = min(run, width)
    if width > MAX_WIDTH:
        return BitonicPlan(width, run, 8, False,
                           f"ka*chunks*run={ka * chunks * run} exceeds "
                           f"{MAX_WIDTH} lanes", chunks)
    if m * width * 8 > PRODUCT_BUDGET_BYTES:
        return BitonicPlan(width, run, 8, False,
                           f"m*Wp*8={m * width * 8} exceeds "
                           f"product budget {PRODUCT_BUDGET_BYTES}", chunks)
    tile_rows = max(8, min(512, _TILE_ELEMS // width))
    return BitonicPlan(width, run, tile_rows, True, "", chunks)


def plan_bitonic(A: ELL, B: ELL, allow_split: bool = True) -> BitonicPlan:
    return plan_bitonic_dims(A.nrows, A.max_nnz_per_row, B.max_nnz_per_row,
                             allow_split=allow_split)


def _compare_exchange(k, v, lane, s, asc):
    """One bitonic compare-exchange at (possibly traced) stride s along the
    lane axis.

    XOR-partner access via two cyclic rolls + select: for (lane & s)==0
    the partner sits at +s, else at -s (always within the row — the
    wrapped lanes are never selected). Mosaic lowers traced shifts to
    tpu.dynamic_rotate, so strides may be loop-carried."""
    up = (lane & s) == 0
    width = k.shape[1]
    kf, kb_ = pltpu.roll(k, width - s, axis=1), pltpu.roll(k, s, axis=1)
    vf, vb = pltpu.roll(v, width - s, axis=1), pltpu.roll(v, s, axis=1)
    pk = jnp.where(up, kf, kb_)
    pv = jnp.where(up, vf, vb)
    want_small = asc == up
    take = (want_small & (pk < k)) | (~want_small & (pk > k))
    return jnp.where(take, pk, k), jnp.where(take, pv, v)


def _bitonic_sort(k, v, lane, width: int, start_kk: int = 2,
                  static_strides: bool = False):
    """Ascending in-row bitonic sort of (k, v) pairs over the lane axis.

    start_kk: the first merge round — pass 2*run when the rows arrive as
    alternating-direction sorted runs of that length (skips the first
    log2(run) rounds).

    static_strides=False runs the compare-exchange stages in a fori_loop
    with LOOP-CARRIED (kk, s) strides — a fully unrolled network compiles
    in O(stages * registers) and was measured at minutes of Mosaic compile
    time for w >= 512 with large tiles; the dynamic form compiles in
    seconds at any width. static_strides=True unrolls with Python-int
    shifts (single-op static rotates instead of dynamic_rotate) — faster
    per stage, viable when tiles are small.
    """
    log_w = width.bit_length() - 1
    log_start = start_kk.bit_length() - 1   # rounds skipped: 1..log_start-1
    n_stages = log_w * (log_w + 1) // 2 - (log_start - 1) * log_start // 2
    if n_stages <= 0 or start_kk > width:
        return k, v

    if static_strides:
        kk = start_kk
        while kk <= width:
            asc = (lane & kk) == 0
            s = kk // 2
            while s >= 1:
                k, v = _compare_exchange(k, v, lane, s, asc)
                s //= 2
            kk *= 2
        return k, v

    def body(_, carry):
        k, v, kk, s = carry
        asc = (lane & kk) == 0
        k, v = _compare_exchange(k, v, lane, s, asc)
        nkk = jnp.where(s == 1, kk * 2, kk)
        ns = jnp.where(s == 1, kk, s // 2)
        return k, v, nkk, ns

    k, v, _, _ = jax.lax.fori_loop(
        0, n_stages, body,
        (k, v, jnp.int32(start_kk), jnp.int32(start_kk // 2)))
    return k, v


def _kernel(key_ref, val_ref, out_col_ref, out_val_ref, nnz_ref,
            *, width: int, start_kk: int, static_strides: bool):
    R = key_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, width), 1)
    log_w = width.bit_length() - 1
    k = key_ref[:]
    v = val_ref[:]

    # ---- 1. sort each row by column key (invalid slots carry SENTINEL,
    # so they sink to the row tail) ----
    k, v = _bitonic_sort(k, v, lane, width, start_kk, static_strides)

    # ---- 2. duplicate-run sums: segmented inclusive scan (log2 Wp
    # roll-add steps, resetting at run heads) ----
    head = (lane == 0) | (k != pltpu.roll(k, 1, axis=1))

    def scan_body(t, carry):
        s, f = carry
        d = jnp.int32(1) << t if not static_strides else t
        edge = lane < d
        s_sh = jnp.where(edge, jnp.zeros_like(s), pltpu.roll(s, d, axis=1))
        f_sh = jnp.where(edge, 1, pltpu.roll(f, d, axis=1))
        s = jnp.where(f > 0, s, s + s_sh)
        return s, f | f_sh

    # flags as i32 (Mosaic can't rotate i1); log2(w) doubling steps
    if static_strides:
        carry = (v, head.astype(jnp.int32))
        d = 1
        while d < width:
            carry = scan_body(d, carry)
            d *= 2
        s, _ = carry
    else:
        s, _ = jax.lax.fori_loop(
            0, log_w, scan_body, (v, head.astype(jnp.int32)))

    is_last = ((lane == width - 1) | (k != pltpu.roll(k, width - 1, axis=1)))
    emit = is_last & (k != SENTINEL)
    nnz_ref[:] = jnp.sum(emit.astype(jnp.int32), axis=1, keepdims=True)

    # ---- 3. compact survivors left: omega-network self-routing. Each
    # survivor's destination is its rank among survivors (order-preserving,
    # distinct), so routing destination bits LSB->MSB is collision-free —
    # log2(w) exchange stages instead of a second full bitonic sort. ----
    def rank_body(t, r):
        d = jnp.int32(1) << t if not static_strides else t
        return r + jnp.where(lane < d, 0, pltpu.roll(r, d, axis=1))

    if static_strides:
        rank = emit.astype(jnp.int32)
        d = 1
        while d < width:
            rank = rank_body(d, rank)
            d *= 2
    else:
        rank = jax.lax.fori_loop(0, log_w, rank_body,
                                 emit.astype(jnp.int32))

    k2 = jnp.where(emit, k, SENTINEL)
    v2 = jnp.where(emit, s, jnp.zeros_like(s))
    # dest packed with occupancy: -1 == empty slot
    dest = jnp.where(emit, rank - 1, -1)

    def route_body(t, carry):
        k2, v2, dest = carry
        bit = jnp.int32(1) << t if not static_strides else t
        up = (lane & bit) == 0  # partner at +bit, else -bit
        back = width - bit

        def partner(x):
            return jnp.where(up, pltpu.roll(x, back, axis=1),
                             pltpu.roll(x, bit, axis=1))

        pd = partner(dest)
        pk = partner(k2)
        pv = partner(v2)
        crossing = (dest >= 0) & (((lane ^ dest) & bit) > 0)
        p_crossing = (pd >= 0) & (((lane ^ pd) & bit) == 0)
        # partner crosses INTO this lane iff its dest bit matches ours
        keep = (dest >= 0) & ~crossing
        nk = jnp.where(p_crossing, pk, jnp.where(keep, k2, SENTINEL))
        nv = jnp.where(p_crossing, pv, jnp.where(keep, v2,
                                                 jnp.zeros_like(v2)))
        nd = jnp.where(p_crossing, pd, jnp.where(keep, dest, -1))
        return nk, nv, nd

    if static_strides:
        carry = (k2, v2, dest)
        bit = 1
        while bit < width:
            carry = route_body(bit, carry)
            bit *= 2
        k2, v2, _ = carry
    else:
        k2, v2, _ = jax.lax.fori_loop(0, log_w, route_body,
                                      (k2, v2, dest))

    out_col_ref[:] = jnp.where(k2 == SENTINEL, -1, k2)
    out_val_ref[:] = jnp.where(k2 == SENTINEL, jnp.zeros_like(v2), v2)


_TILE_LANES = 128  # rows per transposed tile


def _sort_only_kernel_t(key_ref, val_ref, out_k_ref, out_v_ref,
                        *, width: int, start_kk: int,
                        static_strides: bool, transpose_in: bool):
    """transpose_in: refs are row-major (L, width) tiles; transpose to the
    (width, L) sublane-sort layout IN VMEM (cheaper than XLA's HBM
    round-trip transposes)."""
    if transpose_in:
        k0 = key_ref[:].T
        v0 = val_ref[:].T
    else:
        k0 = key_ref[:]
        v0 = val_ref[:]
    L = k0.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
    k, v = _bitonic_sort_t(k0, v0, sub, width, start_kk, static_strides)
    out_k_ref[:] = k
    out_v_ref[:] = v


def _bitonic_sort_t(k, v, sub, width: int, start_kk: int,
                    static_strides: bool):
    def cx(k, v, s, asc):
        up = (sub & s) == 0
        kf = pltpu.roll(k, width - s, axis=0)
        kb_ = pltpu.roll(k, s, axis=0)
        vf = pltpu.roll(v, width - s, axis=0)
        vb = pltpu.roll(v, s, axis=0)
        pk = jnp.where(up, kf, kb_)
        pv = jnp.where(up, vf, vb)
        want_small = asc == up
        take = (want_small & (pk < k)) | (~want_small & (pk > k))
        return jnp.where(take, pk, k), jnp.where(take, pv, v)

    if static_strides:
        kk = start_kk
        while kk <= width:
            asc = (sub & kk) == 0
            s = kk // 2
            while s >= 1:
                k, v = cx(k, v, s, asc)
                s //= 2
            kk *= 2
        return k, v

    def body(_, carry):
        k, v, kk, s = carry
        asc = (sub & kk) == 0
        k, v = cx(k, v, s, asc)
        nkk = jnp.where(s == 1, kk * 2, kk)
        ns = jnp.where(s == 1, kk, s // 2)
        return k, v, nkk, ns

    log_w = width.bit_length() - 1
    log_start = start_kk.bit_length() - 1
    n_stages = log_w * (log_w + 1) // 2 - (log_start - 1) * log_start // 2
    if n_stages > 0 and start_kk <= width:
        k, v, _, _ = jax.lax.fori_loop(
            0, n_stages, body,
            (k, v, jnp.int32(start_kk), jnp.int32(start_kk // 2)))
    return k, v


def _compress_kernel_t(key_ref, val_ref, out_col_ref, out_val_ref, nnz_ref,
                       *, width: int, static_strides: bool,
                       transpose_out: bool, out_width: int | None = None):
    """Compress phase on pre-sorted transposed tiles: segmented scan,
    rank, omega routing — split from the sort so each kernel's live-array
    set fits scoped VMEM with the static-stride (cheap sublane rotate)
    form. transpose_out: write row-major (L, width) tiles. out_width:
    write only the first out_width sublanes of the routed result (the
    caller guarantees — or verifies via nnz — that every row's survivors
    fit)."""
    L = key_ref.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
    _compress_body_t(key_ref[:], val_ref[:], sub, out_col_ref, out_val_ref,
                     nnz_ref, width=width, static_strides=static_strides,
                     transpose_out=transpose_out, out_width=out_width)


def _compress_body_t(k, v, sub, out_col_ref, out_val_ref, nnz_ref,
                     *, width: int, static_strides: bool,
                     transpose_out: bool, out_width: int | None = None):
    log_w = width.bit_length() - 1

    head = (sub == 0) | (k != pltpu.roll(k, 1, axis=0))

    def scan_body(t, carry):
        s, f = carry
        d = jnp.int32(1) << t if not static_strides else t
        edge = sub < d
        s_sh = jnp.where(edge, jnp.zeros_like(s), pltpu.roll(s, d, axis=0))
        f_sh = jnp.where(edge, 1, pltpu.roll(f, d, axis=0))
        s = jnp.where(f > 0, s, s + s_sh)
        return s, f | f_sh

    if static_strides:
        carry = (v, head.astype(jnp.int32))
        d = 1
        while d < width:
            carry = scan_body(d, carry)
            d *= 2
        s, _ = carry
    else:
        s, _ = jax.lax.fori_loop(0, log_w, scan_body,
                                 (v, head.astype(jnp.int32)))

    is_last = ((sub == width - 1) | (k != pltpu.roll(k, width - 1, axis=0)))
    emit = is_last & (k != SENTINEL)
    # nnz block is always row-major (L, 1) — a tiny in-VMEM transpose
    nnz_ref[:] = jnp.sum(emit.astype(jnp.int32), axis=0, keepdims=True).T

    def rank_body(t, r):
        d = jnp.int32(1) << t if not static_strides else t
        return r + jnp.where(sub < d, 0, pltpu.roll(r, d, axis=0))

    if static_strides:
        rank = emit.astype(jnp.int32)
        d = 1
        while d < width:
            rank = rank_body(d, rank)
            d *= 2
    else:
        rank = jax.lax.fori_loop(0, log_w, rank_body,
                                 emit.astype(jnp.int32))

    k2 = jnp.where(emit, k, SENTINEL)
    v2 = jnp.where(emit, s, jnp.zeros_like(s))
    dest = jnp.where(emit, rank - 1, -1)

    def route_body(t, carry):
        k2, v2, dest = carry
        bit = jnp.int32(1) << t if not static_strides else t
        up = (sub & bit) == 0
        back = width - bit

        def partner(x):
            return jnp.where(up, pltpu.roll(x, back, axis=0),
                             pltpu.roll(x, bit, axis=0))

        pd = partner(dest)
        pk = partner(k2)
        pv = partner(v2)
        crossing = (dest >= 0) & (((sub ^ dest) & bit) > 0)
        p_crossing = (pd >= 0) & (((sub ^ pd) & bit) == 0)
        keep = (dest >= 0) & ~crossing
        nk = jnp.where(p_crossing, pk, jnp.where(keep, k2, SENTINEL))
        nv = jnp.where(p_crossing, pv, jnp.where(keep, v2,
                                                 jnp.zeros_like(v2)))
        nd = jnp.where(p_crossing, pd, jnp.where(keep, dest, -1))
        return nk, nv, nd

    if static_strides:
        carry = (k2, v2, dest)
        bit = 1
        while bit < width:
            carry = route_body(bit, carry)
            bit *= 2
        k2, v2, _ = carry
    else:
        k2, v2, _ = jax.lax.fori_loop(0, log_w, route_body,
                                      (k2, v2, dest))

    col = jnp.where(k2 == SENTINEL, -1, k2)
    out_v = jnp.where(k2 == SENTINEL, jnp.zeros_like(v2), v2)
    if out_width is not None and out_width < width:
        col = col[:out_width]
        out_v = out_v[:out_width]
    if transpose_out:
        out_col_ref[:] = col.T
        out_val_ref[:] = out_v.T
    else:
        out_col_ref[:] = col
        out_val_ref[:] = out_v


def _fused_kernel_t(key_ref, val_ref, out_col_ref, out_val_ref, nnz_ref,
                    *, width: int, start_kk: int, static_strides: bool,
                    transpose_in: bool = False,
                    out_width: int | None = None):
    """Sort + compress in ONE kernel on (width, L) tiles (transposed in
    VMEM from row-major (L, width) tiles when transpose_in). Saves the
    HBM round trip of the intermediate sorted pair; fits scoped VMEM only
    for width <= FUSED_MAX_WIDTH."""
    if transpose_in:
        k0, v0 = key_ref[:].T, val_ref[:].T
    else:
        k0, v0 = key_ref[:], val_ref[:]
    L = k0.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
    k, v = _bitonic_sort_t(k0, v0, sub, width, start_kk, static_strides)
    _compress_body_t(k, v, sub, out_col_ref, out_val_ref, nnz_ref,
                     width=width, static_strides=static_strides,
                     transpose_out=False, out_width=out_width)


@functools.partial(jax.jit,
                   static_argnames=("width", "start_kk", "interpret",
                                    "static_strides", "pre_transposed",
                                    "out_width"))
def _sort_compress_cols(key, val, *, width: int, start_kk: int,
                        interpret: bool, static_strides: bool = True,
                        pre_transposed: bool = False,
                        out_width: int | None = None):
    """Transposed-layout entry. pre_transposed=False: key/val are
    ROW-major (m, width) and the input transpose to the sublane-sort
    layout happens IN VMEM inside the sort kernel (XLA-level transposes
    cost an HBM round trip each). pre_transposed=True: key/val already
    arrive as (width, m) — _expand_ell(transpose_out=True) fused the
    transpose into the expand — and the kernel consumes them directly.
    Two Pallas calls (sort, then compress) so each stays under scoped
    VMEM with the static-stride sublane-rotate form. Returns row-major
    (col (m, width), val (m, width), nnz (m, 1))."""
    static_strides = static_strides and not interpret
    m = key.shape[1] if pre_transposed else key.shape[0]
    out_w = width if out_width is None else min(out_width, width)
    grid = (pl.cdiv(m, _TILE_LANES),)
    row_tile = lambda w: pl.BlockSpec(  # noqa: E731
        (_TILE_LANES, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    colt = lambda h: pl.BlockSpec(  # noqa: E731
        (h, _TILE_LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    in_specs = ([colt(width)] * 2 if pre_transposed
                else [row_tile(width)] * 2)
    if width <= FUSED_MAX_WIDTH:
        col_t, val_t, nnz = pl.pallas_call(
            functools.partial(_fused_kernel_t, width=width,
                              start_kk=start_kk,
                              static_strides=static_strides,
                              transpose_in=not pre_transposed,
                              out_width=out_w),
            grid=grid,
            in_specs=in_specs,
            out_specs=(colt(out_w), colt(out_w), row_tile(1)),
            out_shape=(jax.ShapeDtypeStruct((out_w, m), jnp.int32),
                       jax.ShapeDtypeStruct((out_w, m), val.dtype),
                       jax.ShapeDtypeStruct((m, 1), jnp.int32)),
            interpret=interpret,
        )(key, val)
        return col_t.T, val_t.T, nnz
    k_s, v_s = pl.pallas_call(
        functools.partial(_sort_only_kernel_t, width=width,
                          start_kk=start_kk,
                          static_strides=static_strides,
                          transpose_in=not pre_transposed),
        grid=grid,
        in_specs=in_specs,
        out_specs=(colt(width), colt(width)),
        out_shape=(jax.ShapeDtypeStruct((width, m), jnp.int32),
                   jax.ShapeDtypeStruct((width, m), val.dtype)),
        interpret=interpret,
    )(key, val)
    col_t, val_t, nnz = pl.pallas_call(
        functools.partial(_compress_kernel_t, width=width,
                          static_strides=static_strides,
                          transpose_out=False, out_width=out_w),
        grid=grid,
        in_specs=[colt(width), colt(width)],
        out_specs=(colt(out_w), colt(out_w), row_tile(1)),
        out_shape=(jax.ShapeDtypeStruct((out_w, m), jnp.int32),
                   jax.ShapeDtypeStruct((out_w, m), val.dtype),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32)),
        interpret=interpret,
    )(k_s, v_s)
    # (in-VMEM transpose_out overflowed scoped VMEM by ~20% at width 1024;
    # the two output transposes stay in XLA)
    return col_t.T, val_t.T, nnz


@functools.partial(jax.jit,
                   static_argnames=("width", "start_kk", "tile_rows",
                                    "interpret", "static_strides"))
def _sort_compress_rows(key, val, *, width: int, start_kk: int,
                        tile_rows: int, interpret: bool,
                        static_strides: bool = False):
    # interpreter walks unrolled networks element-by-element (~5x slower
    # CPU tests); strides are a pure perf knob, so force dynamic there
    static_strides = static_strides and not interpret
    m = key.shape[0]
    grid = (pl.cdiv(m, tile_rows),)
    tile = lambda w: pl.BlockSpec(  # noqa: E731
        (tile_rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, width=width, start_kk=start_kk,
                          static_strides=static_strides),
        grid=grid,
        in_specs=[tile(width), tile(width)],
        out_specs=(tile(width), tile(width), tile(1)),
        out_shape=(jax.ShapeDtypeStruct((m, width), jnp.int32),
                   jax.ShapeDtypeStruct((m, width), val.dtype),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32)),
        interpret=interpret,
    )(key, val)


@functools.partial(jax.jit, static_argnames=("width", "run",
                                             "transpose_out", "chunks"))
def _expand_ell(a_col, a_val, b_col, b_val, *, width: int, run: int,
                transpose_out: bool = False, chunks: int = 1):
    """Row-gather B's ELL rows at A's columns; outer-multiply.

    Returns (m, width) product keys and values where each A-entry's
    products form a sorted run of length `run` (SENTINEL-padded), with
    every odd run REVERSED — the alternating-direction layout the bitonic
    network needs to skip its first log2(run) rounds.

    The reversal is baked into the GATHER: the packed B table is doubled
    with pre-reversed rows and odd A-entries index the reversed half.
    (Reversing the gathered (m, ka, run) products with flip+where
    miscompiles on TPU at large m — odd runs came back all-SENTINEL — so
    the per-product arrays are never flipped.)

    transpose_out=True returns (width, m) — the sublane-sort layout the
    transposed kernel consumes directly. The transpose is emitted INSIDE
    this jit so XLA fuses it into the gather's consumer fusion (one
    HBM pass) instead of the kernel paying per-tile VMEM transposes.
    """
    m, ka = a_col.shape
    k, kb = b_col.shape
    # pad B rows to chunks*run and cut into `chunks` sub-rows of `run`
    # slots (sub-run splitting: each A entry gathers `chunks` table rows)
    bc_p = jnp.pad(b_col, ((0, 0), (0, chunks * run - kb)),
                   constant_values=-1)
    bv_p = jnp.pad(b_val, ((0, 0), (0, chunks * run - kb)))
    if chunks > 1:
        bc_p = bc_p.reshape(k * chunks, run)
        bv_p = bv_p.reshape(k * chunks, run)
        k = k * chunks
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, ka, chunks), 2)
        a_col = (jnp.where(a_col[:, :, None] >= 0,
                           a_col[:, :, None] * chunks + sub, -1)
                 .reshape(m, ka * chunks))
        a_val = jnp.broadcast_to(a_val[:, :, None],
                                 (m, ka, chunks)).reshape(m, ka * chunks)
        ka = ka * chunks
    parity = (jax.lax.broadcasted_iota(jnp.int32, (1, ka), 1) & 1)
    rows = jnp.clip(a_col, 0, k - 1) + k * parity        # (m, ka)
    if a_val.dtype == jnp.float32:
        # 2-D packed (col | value-bits) table + FLAT indices: one gather at
        # ~index-count cost (the 3-D gather form costs ~50x more).
        fwd = jnp.concatenate(
            [bc_p, jax.lax.bitcast_convert_type(bv_p, jnp.int32)], axis=1)
        rev = jnp.concatenate(
            [jnp.flip(bc_p, axis=1),
             jax.lax.bitcast_convert_type(jnp.flip(bv_p, axis=1),
                                          jnp.int32)], axis=1)
        table = jnp.concatenate([fwd, rev], axis=0)      # (2k, 2*run)
        g = table[rows.reshape(-1)]                      # (m*ka, 2*run)
        bc = g[:, :run].reshape(m, ka, run)
        bv = jax.lax.bitcast_convert_type(g[:, run:], jnp.float32
                                          ).reshape(m, ka, run)
    else:
        bc_t = jnp.concatenate([bc_p, jnp.flip(bc_p, axis=1)], axis=0)
        bv_t = jnp.concatenate([bv_p, jnp.flip(bv_p, axis=1)], axis=0)
        flat = rows.reshape(-1)
        bc = bc_t[flat].reshape(m, ka, run)
        bv = bv_t[flat].reshape(m, ka, run)
    valid = (a_col >= 0)[:, :, None] & (bc >= 0)
    key = jnp.where(valid, bc, SENTINEL).reshape(m, ka * run)
    val = jnp.where(valid, a_val[:, :, None] * bv, 0).reshape(m, ka * run)
    pad = width - ka * run
    if transpose_out:
        key, val = key.T, val.T
        if pad:
            key = jnp.pad(key, ((0, pad), (0, 0)), constant_values=SENTINEL)
            val = jnp.pad(val, ((0, pad), (0, 0)))
        return key, val
    if pad:
        key = jnp.pad(key, ((0, 0), (0, pad)), constant_values=SENTINEL)
        val = jnp.pad(val, ((0, 0), (0, pad)))
    return key, val


@functools.partial(jax.jit, static_argnames=("run", "chunks"))
def _expand_gather_emajor(a_col, a_val, b_col, b_val, *, run: int,
                          chunks: int = 1):
    """Bandwidth-shaped expand, stage 1 of 2 (f32): ONE wide-row gather in
    ENTRY-MAJOR order. Stage 2 (the select/multiply/layout pass) lives in
    the Pallas sort kernel's prologue — XLA's version of that pass ran at
    11x off bandwidth because 32-lane slices/reshapes are tile-misaligned
    (measured, scripts/x_expand_probe2.py).

    The packed table stores each (sub-run of a) B row as ONE >=128-lane
    row [col_fwd | val_bits_fwd | col_rev | val_bits_rev]: forward and
    pre-reversed halves travel in the same fetched row (gathers of
    >=128-lane rows run at ~HBM bandwidth on v5e; 64-lane rows are
    issue-bound and cost 3.5x). A final all -1 sentinel row absorbs
    invalid A entries. Entry-major index order makes the gather output
    reshape to (ka, m, lanes) so the kernel can take contiguous
    (L, lanes) blocks per entry.

    Returns g (ka_eff, m, max(128, 4*run)) and avT (ka_eff, m)."""
    m, ka = a_col.shape
    k, kb = b_col.shape
    cap = chunks * run
    bc_p = jnp.pad(b_col, ((0, 0), (0, cap - kb)), constant_values=-1)
    bv_p = jnp.pad(b_val, ((0, 0), (0, cap - kb)))
    if chunks > 1:
        bc_p = bc_p.reshape(k * chunks, run)
        bv_p = bv_p.reshape(k * chunks, run)
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, ka, chunks), 2)
        a_col = (jnp.where(a_col[:, :, None] >= 0,
                           a_col[:, :, None] * chunks + sub, -1)
                 .reshape(m, ka * chunks))
        a_val = jnp.broadcast_to(a_val[:, :, None],
                                 (m, ka, chunks)).reshape(m, ka * chunks)
        ka = ka * chunks
    kt = k * chunks
    bv_bits = jax.lax.bitcast_convert_type(bv_p, jnp.int32)
    wide = jnp.concatenate(
        [bc_p, bv_bits, jnp.flip(bc_p, axis=1),
         jnp.flip(bv_bits, axis=1)], axis=1)          # (kt, 4*run)
    if wide.shape[1] < 128:
        wide = jnp.pad(wide, ((0, 0), (0, 128 - wide.shape[1])))
    # sentinel row kt: cols -1 (masked to SENTINEL in the kernel)
    wide = jnp.pad(wide, ((0, 1), (0, 0)), constant_values=-1)
    rows = jnp.where(a_col >= 0, jnp.clip(a_col, 0, kt - 1), kt)
    g = wide[rows.T.reshape(-1)]                      # (ka*m, >=4*run)
    return g.reshape(ka, m, g.shape[1]), a_val.T


def _prologue_to_refs(g_ref, av_ref, k_ref, v_ref, *, ka: int, run: int,
                      width: int, L: int):
    """In-VMEM expand epilogue: per entry e, transpose its (L, lanes)
    gathered block, select the fwd/rev (run, L) col/val slices by entry
    parity (sublane-aligned — the XLA equivalent was lane-misaligned and
    11x off bandwidth), mask, multiply by a_val, and write each slice
    straight into the (width, L) product refs (incremental writes keep
    the scoped-VMEM live set at one slice, vs the 27 MB a concat of all
    ka slices cost)."""
    for e in range(ka):
        geT = g_ref[e].T                  # (lanes, L)
        if e % 2 == 1:
            c = geT[2 * run:3 * run]
            vbits = geT[3 * run:4 * run]
        else:
            c = geT[0:run]
            vbits = geT[run:2 * run]
        v = jax.lax.bitcast_convert_type(vbits, jnp.float32)
        valid = c >= 0
        k_ref[e * run:(e + 1) * run, :] = jnp.where(valid, c, SENTINEL)
        v_ref[e * run:(e + 1) * run, :] = jnp.where(
            valid, av_ref[e][None, :] * v, 0.0)
    pad = width - ka * run
    if pad:
        k_ref[ka * run:, :] = jnp.full((pad, L), SENTINEL, jnp.int32)
        v_ref[ka * run:, :] = jnp.zeros((pad, L), jnp.float32)


def _expand_sort_kernel_t(g_ref, av_ref, out_k_ref, out_v_ref,
                          *, ka: int, run: int, width: int,
                          start_kk: int, static_strides: bool):
    """Fused expand-prologue + bitonic sort: consumes the e-major gather
    directly — the (width, m) product pair never round-trips HBM
    unsorted. The prologue stages through the OUTPUT refs (free VMEM)."""
    L = av_ref.shape[1]
    _prologue_to_refs(g_ref, av_ref, out_k_ref, out_v_ref, ka=ka, run=run,
                      width=width, L=L)
    sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
    k, v = _bitonic_sort_t(out_k_ref[:], out_v_ref[:], sub, width,
                           start_kk, static_strides)
    out_k_ref[:] = k
    out_v_ref[:] = v


def _expand_sort_compress_kernel_t(g_ref, av_ref, out_col_ref, out_val_ref,
                                   nnz_ref, k_scratch, v_scratch,
                                   *, ka: int, run: int,
                                   width: int, start_kk: int,
                                   static_strides: bool,
                                   out_width: int | None):
    """Whole pipeline in ONE kernel (expand prologue + sort + compress)
    for widths whose live set fits scoped VMEM. Stages the product pair
    through (width, L) scratch."""
    L = av_ref.shape[1]
    _prologue_to_refs(g_ref, av_ref, k_scratch, v_scratch, ka=ka, run=run,
                      width=width, L=L)
    sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
    k, v = _bitonic_sort_t(k_scratch[:], v_scratch[:], sub, width,
                           start_kk, static_strides)
    _compress_body_t(k, v, sub, out_col_ref, out_val_ref, nnz_ref,
                     width=width, static_strides=static_strides,
                     transpose_out=False, out_width=out_width)


# g-tile VMEM budget for the fused expand path: ka_eff * lane_width
# elements per tile lane-row (x 128 lanes x 4 B); past this the prologue's
# gather tile alone crowds scoped VMEM and the caller falls back to the
# XLA expand.
_EXPAND_TILE_ELEMS = 8192
# the fused expand+sort kernel's live set (gather tile + product pair +
# unrolled sort temporaries) needs ~27 MB at width 1024 — past the 16 MB
# default scoped cap but well within the chip's physical VMEM; raise the
# cap for the fused kernels only
_FUSED_VMEM_LIMIT = 64 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=("width", "run", "ka", "start_kk",
                                    "interpret", "static_strides",
                                    "out_width"))
def _sort_compress_from_gather(g, avT, *, width: int, run: int, ka: int,
                               start_kk: int, interpret: bool,
                               static_strides: bool = True,
                               out_width: int | None = None):
    """Cols-layout pipeline fed by the e-major gather (g, avT): fused
    expand+sort (+compress when VMEM allows). Returns row-major
    (col (m, out_w), val (m, out_w), nnz (m, 1))."""
    static_strides = static_strides and not interpret
    m = avT.shape[1]
    lanes = g.shape[2]
    out_w = width if out_width is None else min(out_width, width)
    grid = (pl.cdiv(m, _TILE_LANES),)
    gspec = pl.BlockSpec((ka, _TILE_LANES, lanes), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    avspec = pl.BlockSpec((ka, _TILE_LANES), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    colt = lambda h: pl.BlockSpec(  # noqa: E731
        (h, _TILE_LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    row_tile = lambda w: pl.BlockSpec(  # noqa: E731
        (_TILE_LANES, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if width <= FUSED_MAX_WIDTH:
        col_t, val_t, nnz = pl.pallas_call(
            functools.partial(_expand_sort_compress_kernel_t, ka=ka,
                              run=run, width=width, start_kk=start_kk,
                              static_strides=static_strides,
                              out_width=out_w),
            grid=grid,
            in_specs=[gspec, avspec],
            out_specs=(colt(out_w), colt(out_w), row_tile(1)),
            out_shape=(jax.ShapeDtypeStruct((out_w, m), jnp.int32),
                       jax.ShapeDtypeStruct((out_w, m), jnp.float32),
                       jax.ShapeDtypeStruct((m, 1), jnp.int32)),
            scratch_shapes=[pltpu.VMEM((width, _TILE_LANES), jnp.int32),
                            pltpu.VMEM((width, _TILE_LANES), jnp.float32)],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=_FUSED_VMEM_LIMIT),
            interpret=interpret,
        )(g, avT)
        return col_t.T, val_t.T, nnz
    k_s, v_s = pl.pallas_call(
        functools.partial(_expand_sort_kernel_t, ka=ka, run=run,
                          width=width, start_kk=start_kk,
                          static_strides=static_strides),
        grid=grid,
        in_specs=[gspec, avspec],
        out_specs=(colt(width), colt(width)),
        out_shape=(jax.ShapeDtypeStruct((width, m), jnp.int32),
                   jax.ShapeDtypeStruct((width, m), jnp.float32)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=interpret,
    )(g, avT)
    col_t, val_t, nnz = pl.pallas_call(
        functools.partial(_compress_kernel_t, width=width,
                          static_strides=static_strides,
                          transpose_out=False, out_width=out_w),
        grid=grid,
        in_specs=[colt(width), colt(width)],
        out_specs=(colt(out_w), colt(out_w), row_tile(1)),
        out_shape=(jax.ShapeDtypeStruct((out_w, m), jnp.int32),
                   jax.ShapeDtypeStruct((out_w, m), jnp.float32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32)),
        interpret=interpret,
    )(k_s, v_s)
    return col_t.T, val_t.T, nnz


def bucketed_viable(row_lens: np.ndarray, kb: int,
                    value_bytes: int = 4) -> bool:
    """Probe: can the row-bucketed kernel handle rows with these lengths?
    Only each row's OWN products must fit the lane budget, and the summed
    class buffers must fit the product budget."""
    run = max(1, _next_pow2(kb))
    lens = np.maximum(np.asarray(row_lens, dtype=np.int64), 1)
    widths = np.maximum(128, np.vectorize(_next_pow2)(lens * run))
    if widths.max(initial=128) > MAX_WIDTH:
        return False
    return int(widths.sum()) * 2 * value_bytes <= PRODUCT_BUDGET_BYTES


def spgemm_bitonic_bucketed(A: ELL, B: ELL, *, max_buckets: int = 4,
                            interpret: bool | None = None) -> ELL | None:
    """Row-bucketed bitonic SpGEMM: group A's rows by product width class
    and run one kernel per class.

    A single global width pads every row to the LONGEST row's products
    (the reference pays the same tax in its ELL kernel's K,
    ell/common_ell.h:117-133); with skewed row lengths most lanes are
    sentinels. Bucketing rows into pow2 width classes cuts both the expand
    gather (indices ~ sum of class ka) and the sort work (~ sum of
    count*width), and extends viability: only rows whose own products
    exceed MAX_WIDTH reject the plan, not the global max.

    Returns None when any class is non-viable (caller falls back to ESC).
    Row counts per class are bucketed to pow2 so recompiles stay bounded.
    """
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = A.nrows
    run = max(1, _next_pow2(B.max_nnz_per_row))
    lens = np.asarray(A.nnz_row).astype(np.int64)
    widths = np.maximum(128, np.vectorize(_next_pow2)(
        np.maximum(lens, 1) * run))
    classes = np.unique(widths)
    if classes[-1] > MAX_WIDTH:
        return None
    while len(classes) > max_buckets:
        # merge the class with the fewest rows into the next one up
        counts = np.array([(widths == w).sum() for w in classes[:-1]])
        i = int(np.argmin(counts))
        widths[widths == classes[i]] = classes[i + 1]
        classes = np.unique(widths)

    out_w = int(classes[-1])
    out_col = jnp.full((m, out_w), -1, jnp.int32)
    out_val = jnp.zeros((m, out_w), A.values.dtype)
    out_nnz = jnp.zeros((m,), jnp.int32)
    from ia_spgemm_tpu import config as _cfg
    for w in classes:
        idx = np.nonzero(widths == w)[0]
        ka_c = int(max(int(lens[idx].max()), 1))
        n_pad = _cfg.bucket_capacity(len(idx))
        idx_pad = np.pad(idx, (0, n_pad - len(idx)))  # repeats row idx[0]
        idx_d = jnp.asarray(idx_pad.astype(np.int32))
        a_col = jnp.take(A.col_ind[:, :ka_c], idx_d, axis=0)
        a_val = jnp.take(A.values[:, :ka_c], idx_d, axis=0)
        plan = plan_bitonic_dims(n_pad, ka_c, B.max_nnz_per_row,
                                 allow_split=False)
        if not plan.viable or plan.width > w:
            # (plan.width <= w by construction; guard stays for safety)
            return None
        key, val = _expand_ell(a_col, a_val, B.col_ind, B.values,
                               width=int(w), run=run)
        col_c, val_c, nnz_c = _sort_compress_rows(
            key, val, width=int(w), start_kk=2 * run,
            tile_rows=max(8, min(512, _TILE_ELEMS // int(w))),
            interpret=interpret,
            static_strides=int(w) <= STATIC_STRIDE_MAX_WIDTH)
        k = len(idx)
        pad_cols = out_w - int(w)
        if pad_cols:
            col_c = jnp.pad(col_c, ((0, 0), (0, pad_cols)),
                            constant_values=-1)
            val_c = jnp.pad(val_c, ((0, 0), (0, pad_cols)))
        out_col = out_col.at[jnp.asarray(idx.astype(np.int32))].set(
            col_c[:k])
        out_val = out_val.at[jnp.asarray(idx.astype(np.int32))].set(
            val_c[:k])
        out_nnz = out_nnz.at[jnp.asarray(idx.astype(np.int32))].set(
            nnz_c[:k, 0])
    return ELL(col_ind=out_col, values=out_val, nnz_row=out_nnz,
               nnz=jnp.sum(out_nnz).astype(jnp.int32),
               shape=(A.nrows, B.ncols))


# the (width, 128) transposed tiles hold ~10 live arrays; widths past this
# risk the ~16MB scoped VMEM limit (1024 validated on chip)
TRANSPOSED_MAX_WIDTH = 1024
# sort+compress in one kernel (saves the intermediate HBM round trip and
# a launch); the larger live set fits the 16MB scoped VMEM only up to this
# width (width 1024 measured needing 35MB at 128-lane tiles)
FUSED_MAX_WIDTH = 256


def spgemm_bitonic(A: ELL, B: ELL, plan: BitonicPlan | None = None,
                   interpret: bool | None = None,
                   layout: str = "auto",
                   out_width: int | None = None) -> ELL:
    """C = A @ B via per-row VMEM bitonic sort-compress. Returns canonical
    left-justified ELL with ascending columns per row.

    layout: "auto" picks the transposed kernel (products along SUBLANES,
    whose static rotates measured ~3x cheaper than lane rotates; inputs
    transpose IN VMEM, outputs via XLA) for widths within its VMEM
    budget — measured ~10% faster end-to-end at width 1024 — and the
    row-major kernel otherwise. "rows"/"cols" force a variant.

    out_width: optional cap on the returned ELL width (pow2 <= plan
    width). The compress kernel then writes only out_width columns —
    halving or better the output traffic when nnz(C) rows are much
    shorter than the product width. CONTRACT: the caller guarantees every
    output row's nnz fits (e.g. from a previous run's nnz_row, the
    steady-state shape in iterated benchmarks/solvers); surplus entries
    are silently dropped, so verify max(nnz_row) <= out_width once."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    if plan is None:
        plan = plan_bitonic(A, B)
    if not plan.viable:
        raise ValueError(f"bitonic plan not viable: {plan.reason}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    use_cols = layout == "cols" or (layout == "auto"
                                    and plan.width <= TRANSPOSED_MAX_WIDTH)
    ka_eff = A.col_ind.shape[1] * plan.chunks
    lanes = max(128, 4 * plan.run)
    fused_expand = (use_cols
                    and A.values.dtype == jnp.float32
                    and B.values.dtype == jnp.float32
                    and ka_eff * plan.run <= plan.width
                    and ka_eff * lanes <= _EXPAND_TILE_ELEMS)
    if fused_expand:
        g, avT = _expand_gather_emajor(A.col_ind, A.values, B.col_ind,
                                       B.values, run=plan.run,
                                       chunks=plan.chunks)
        col, out_val, nnz = _sort_compress_from_gather(
            g, avT, width=plan.width, run=plan.run, ka=ka_eff,
            start_kk=2 * plan.run, interpret=interpret,
            static_strides=plan.width <= STATIC_STRIDE_MAX_WIDTH,
            out_width=out_width)
        nnz_row = nnz[:, 0]
    elif use_cols:
        key, val = _expand_ell(A.col_ind, A.values, B.col_ind, B.values,
                               width=plan.width, run=plan.run,
                               transpose_out=True, chunks=plan.chunks)
        col, out_val, nnz = _sort_compress_cols(
            key, val, width=plan.width, start_kk=2 * plan.run,
            interpret=interpret,
            static_strides=plan.width <= STATIC_STRIDE_MAX_WIDTH,
            pre_transposed=True, out_width=out_width)
        nnz_row = nnz[:, 0]
    else:
        key, val = _expand_ell(A.col_ind, A.values, B.col_ind, B.values,
                               width=plan.width, run=plan.run,
                               transpose_out=False, chunks=plan.chunks)
        col, out_val, nnz_row = _sort_compress_rows(
            key, val, width=plan.width, start_kk=2 * plan.run,
            tile_rows=plan.tile_rows, interpret=interpret,
            static_strides=plan.width <= STATIC_STRIDE_MAX_WIDTH)
        nnz_row = nnz_row[:, 0]
    return ELL(col_ind=col, values=out_val, nnz_row=nnz_row,
               nnz=jnp.sum(nnz_row).astype(jnp.int32),
               shape=(A.nrows, B.ncols))
