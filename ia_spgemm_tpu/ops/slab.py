"""Slab-packed ESC — expand/sort/compress with many C rows per VMEM tile.

Reference semantics: the GPU ESC pipeline
(IA-SPGEMM-GPU_release/detail/csr_dev/common_csr_dev.h:134-254) expands
every intermediate product, sorts the whole stream by (row, col), and
compresses duplicates with reduce_by_key; the sliced variant
(coo_dev/common_coo_dev.h:388-450) partitions rows so each slice's
expansion fits the workspace.

TPU-first redesign: a global device sort runs ~25x off HBM bandwidth at
multi-million E (ops/esc.py header), and the per-row width-class kernels
(ops/bitonic.py) pay pow2 padding per row (~40% on near-uniform inputs)
plus per-class dispatch machinery. This engine keeps the ESC structure
but packs WHOLE ROWS back-to-back into fixed-width SLABS:

  1. plan (host, nnz-scaled numpy): greedy row packing over the padded
     per-row product counts — the reference's upper_bound search over
     cummulative_row_workspace (coo_dev:388-421) at VMEM-tile scale;
     per-slab fragment index matrices (pre-transposed — the argument-
     layout table gather measured 6x slower un-transposed,
     reports/tablegather_probe.json).
  2. expand+sort (Pallas, cols layout): ONE flat row-gather of packed
     128-lane B fragments at HBM bandwidth, keys = local_row * n + col
     so ONE bitonic network sorts every row in the slab at once (rows
     stay disjoint in key space; duplicates are adjacent within a row).
     The network starts at 2*run — fragments arrive as alternating
     ascending/descending sorted runs like the flat pipeline's.
  3. compress (Pallas): the shared segmented-sum + omega-network
     compaction (bitonic._compress_kernel_t), per slab.
  4. assemble (Pallas DMA): slabs concatenate into exact CSR with one
     sequential pass of dynamic-offset VMEM->HBM copies (each slab's W
     lanes land at the running nnz offset; the next slab's copy
     overwrites the previous slab's padding tail) — no per-element
     scatter/gather anywhere in the epilogue.

vs the per-row classes: a row costs ceil(products/run)*run slots instead
of next_pow2(products), so near-uniform inputs sort ~P slots instead of
~1.4-2x P; vs the global sort: all sorting is VPU work inside VMEM.
f32 only (the packed col|val-bits table); fp64 stays on the global-sort
engine whose summation order the golden tests pin.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ia_spgemm_tpu import config as cfg
from ia_spgemm_tpu.formats.types import CSR, SlabCSR
from ia_spgemm_tpu.ops import bitonic
from ia_spgemm_tpu.ops.bitonic import (
    SENTINEL,
    _COLS_STATIC_MAX_WIDTH,
    _EXPAND_TILE_ELEMS,
    _FUSED_VMEM_LIMIT,
    _TILE_LANES,
)

# default sub-run fragment length: 32 packs [col|val|col_rev|val_rev]
# into exactly 128 table lanes — row-gathers of >=128-lane rows run at
# HBM bandwidth on v5e while 64-lane rows issue-bind the gather units
# (reports/tablegather_probe.json: preT run=32 381 GB/s vs run=16 280)
DEFAULT_RUN = 32
# cols-layout sort width cap (bitonic.TRANSPOSED_MAX_WIDTH): wider
# needs the rows layout whose XLA expand is lane-misaligned
SLAB_MAX_WIDTH = 1024
SLAB_MIN_WIDTH = 512
# total padded product slots allowed (n_slabs * width); 2 GB of key+val
SLAB_ELEMS_BUDGET = 1 << 28


@dataclasses.dataclass
class SlabPlan:
    """Host-side slab packing + device operands for one (A, B) problem."""
    width: int
    run: int
    n_slabs: int           # padded to a _TILE_LANES multiple
    out_cap: int
    nnz_bound: int         # exact output-nnz upper bound (pre-bucket)
    m: int
    n: int
    padded_slots: int      # n_slabs * width (sort volume incl. padding)
    true_flops: int        # exact E (GetFlop)
    # device arrays
    mt: jax.Array          # (F_c, n_slabs) fragment-table row ids
    avt: jax.Array         # (F_c, n_slabs) owning A values
    lrt: jax.Array         # (F_c, n_slabs) slab-local C-row ids
    table: jax.Array       # packed B fragment table (F_B+1, lanes)
    slab_first_row: jax.Array  # (n_slabs, 1) global row of local row 0


def _expand_sort_kernel_lr(g_ref, av_ref, lr_ref, out_k_ref, out_v_ref,
                           *, ka: int, run: int, width: int, n: int,
                           start_kk: int, static_strides: bool,
                           ka_blocks: int = 1):
    """bitonic._expand_sort_kernel_t with slab-local row keys: each
    fragment's sorted B columns become keys local_row * n + col, so one
    network sorts every packed row at once and duplicate (row, col)
    products land adjacent. Monotone col runs stay monotone under the
    constant per-fragment offset, so the presorted start (2*run) holds."""
    L = av_ref.shape[1]
    ka_blk = g_ref.shape[0]

    def emit(e_local, e_global, base):
        geT = g_ref[e_local].T
        if e_global % 2 == 1:
            c = geT[2 * run:3 * run]
            vbits = geT[3 * run:4 * run]
        else:
            c = geT[0:run]
            vbits = geT[run:2 * run]
        v = jax.lax.bitcast_convert_type(vbits, jnp.float32)
        valid = c >= 0
        key = lr_ref[e_local][None, :] * n + c
        out_k_ref[pl.ds(base + e_local * run, run), :] = jnp.where(
            valid, key, SENTINEL)
        out_v_ref[pl.ds(base + e_local * run, run), :] = jnp.where(
            valid, av_ref[e_local][None, :] * v, 0.0)

    pad = width - ka * run
    if ka_blocks == 1:
        for e in range(ka):
            emit(e, e, 0)
        if pad:
            out_k_ref[ka * run:, :] = jnp.full((pad, L), SENTINEL,
                                               jnp.int32)
            out_v_ref[ka * run:, :] = jnp.zeros((pad, L), jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
        k, v = bitonic._bitonic_sort_t(out_k_ref[:], out_v_ref[:], sub,
                                       width, start_kk, static_strides)
        out_k_ref[:] = k
        out_v_ref[:] = v
        return
    j = pl.program_id(1)
    base = j * ka_blk * run
    for e in range(ka_blk):
        # with even ka_blk the block-local parity equals the global one
        emit(e, e, base)

    @pl.when(j == ka_blocks - 1)
    def _():
        if pad:
            out_k_ref[ka * run:, :] = jnp.full((pad, L), SENTINEL,
                                               jnp.int32)
            out_v_ref[ka * run:, :] = jnp.zeros((pad, L), jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
        k, v = bitonic._bitonic_sort_t(out_k_ref[:], out_v_ref[:], sub,
                                       width, start_kk, static_strides)
        out_k_ref[:] = k
        out_v_ref[:] = v


@functools.partial(jax.jit,
                   static_argnames=("width", "run", "ka", "n", "start_kk",
                                    "interpret", "static_strides"))
def _slab_sort_compress(g, avT, lrT, *, width: int, run: int, ka: int,
                        n: int, start_kk: int, interpret: bool,
                        static_strides: bool = True):
    """Cols-layout expand+sort then compress over slab tiles. Returns
    row-major (keys (S, width), vals (S, width), nnz (S, 1)) — keys are
    still local_row * n + col, compacted left per slab."""
    static_strides = static_strides and not interpret
    S = avT.shape[1]
    lanes = g.shape[2]
    L = _TILE_LANES
    ka_blocks = 1
    ka_blk = ka
    while ka_blk * lanes > _EXPAND_TILE_ELEMS and ka_blk % 2 == 0:
        ka_blk //= 2
        ka_blocks *= 2
    if ka_blocks == 1:
        grid = (pl.cdiv(S, L),)
        gspec = pl.BlockSpec((ka, L, lanes), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        fspec = pl.BlockSpec((ka, L), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        colt = lambda h: pl.BlockSpec(  # noqa: E731
            (h, L), lambda i: (0, i), memory_space=pltpu.VMEM)
    else:
        grid = (pl.cdiv(S, L), ka_blocks)
        gspec = pl.BlockSpec((ka_blk, L, lanes), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM)
        fspec = pl.BlockSpec((ka_blk, L), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM)
        colt = lambda h: pl.BlockSpec(  # noqa: E731
            (h, L), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    k_s, v_s = pl.pallas_call(
        functools.partial(_expand_sort_kernel_lr, ka=ka, run=run,
                          width=width, n=n, start_kk=start_kk,
                          static_strides=static_strides,
                          ka_blocks=ka_blocks),
        grid=grid,
        in_specs=[gspec, fspec, fspec],
        out_specs=(colt(width), colt(width)),
        out_shape=(jax.ShapeDtypeStruct((width, S), jnp.int32),
                   jax.ShapeDtypeStruct((width, S), jnp.float32)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=interpret,
    )(g, avT, lrT)
    c1 = lambda h: pl.BlockSpec(  # noqa: E731
        (h, L), lambda i: (0, i), memory_space=pltpu.VMEM)
    key_t, val_t, nnz = pl.pallas_call(
        functools.partial(bitonic._compress_kernel_t, width=width,
                          static_strides=static_strides,
                          transpose_out=False, out_width=None),
        grid=(pl.cdiv(S, L),),
        in_specs=[c1(width), c1(width)],
        out_specs=(c1(width), c1(width),
                   pl.BlockSpec((L, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((width, S), jnp.int32),
                   jax.ShapeDtypeStruct((width, S), jnp.float32),
                   jax.ShapeDtypeStruct((S, 1), jnp.int32)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=interpret,
    )(k_s, v_s)
    return key_t.T, val_t.T, nnz


# NOTE on flat-CSR assembly: the natural epilogue — one sequential pass
# of dynamic-offset VMEM->HBM DMA copies concatenating the per-slab
# compacted streams at HBM bandwidth — is NOT compilable on this
# toolchain: make_async_copy with ANY data-dependent destination offset
# (aligned or not, SMEM- or program_id-sourced) crashes the Mosaic
# remote-compile helper (bisect history in git: v7/v8/v9 probes; dynamic
# SOURCE offsets work fine, hash_spgemm.py relies on them). The engine
# therefore returns its native SlabCSR (exact, row-major sorted, free
# checksum) and flattening is a priced consumer-side conversion,
# exactly like BlockCSR/ELL.


@functools.partial(jax.jit,
                   static_argnames=("F_c", "lanes", "W", "run", "n",
                                    "interpret", "static"))
def _slab_run(table, mt, avt, lrt, *, F_c: int, lanes: int, W: int,
              run: int, n: int, interpret: bool, static: bool):
    """The whole per-call slab pipeline under ONE jit: table gather ->
    expand+sort -> compress -> nnz fold. Running the gather eagerly
    (the round-4 first cut) left its output in whatever layout the
    eager gather picked and paid a per-call relayout copy in front of
    the pallas operand — the suspected 2x per-slot gap vs the flat
    kernels (NOTES round-4 open levers) and a source of run-to-run
    variance; jitting the seam lets XLA lay the gather result out for
    the custom call directly (same fix as the multiclass pipeline's
    in-fn gather)."""
    S_pad = avt.shape[1]
    g = table[mt.reshape(-1)].reshape(F_c, S_pad, lanes)
    keys, vals, nnz_s = _slab_sort_compress(
        g, avt, lrt, width=W, run=run, ka=F_c, n=n,
        start_kk=2 * run, interpret=interpret, static_strides=static)
    return keys, vals, nnz_s, jnp.sum(nnz_s[:, 0]).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Compensated (double-double) slab engine — VERDICT r4 #6: fp64-grade
# accumulation through the slab pipeline instead of the ~25x-off-bandwidth
# global sort (369 ms on the headline, reports/headline_rooflines.json).
# Reference precision envelope: VALUE_TYPE=double (CPU Makefile:5).
# ---------------------------------------------------------------------------

def _obk(x):
    """In-kernel rounding barrier. Mosaic has no lowering for
    lax.optimization_barrier (what esc._ob uses against XLA's
    allow_excess_precision algebraic simplifier), so error-recovery
    sequences like (a + b) - b need a different fence inside Pallas: a
    bitcast round-trip through int32 — a register-level no-op that no
    algebraic rewrite crosses."""
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.int32), jnp.float32)


def _two_sum_k(a_hi, a_lo, b_hi, b_lo):
    """esc._two_sum with the in-kernel barrier (Knuth two-sum +
    renormalize, ~2^-48 relative)."""
    s = _obk(a_hi + b_hi)
    bp = _obk(s - a_hi)
    err = (a_hi - _obk(s - bp)) + (b_hi - bp)
    lo = err + a_lo + b_lo
    hi = _obk(s + lo)
    return hi, lo - (hi - s)


def _two_prod_k(a, b):
    """esc._two_product (Dekker, no FMA) with the in-kernel barrier."""
    split = jnp.asarray(4097.0, jnp.float32)  # 2^12 + 1 for f32
    a1 = _obk(a * split)
    ah = _obk(a1 - (a1 - a))
    al = a - ah
    b1 = _obk(b * split)
    bh = _obk(b1 - (b1 - b))
    bl = b - bh
    p = _obk(a * b)
    e = ((_obk(ah * bh) - p) + _obk(ah * bl) + _obk(al * bh)) + al * bl
    return p, e


def _expand_sort_kernel_lr_dd(g_ref, av_ref, lr_ref, out_k_ref,
                              out_hi_ref, out_lo_ref, *, ka: int,
                              run: int, width: int, n: int,
                              start_kk: int, static_strides: bool,
                              ka_blocks: int = 1):
    """_expand_sort_kernel_lr with exact (hi, lo) products: each
    intermediate product is a Dekker two-product and the sort carries
    both value lanes (bitonic._bitonic_sort_t2)."""
    L = av_ref.shape[1]

    def emit(e_local, e_global, base):
        geT = g_ref[e_local].T
        if e_global % 2 == 1:
            c = geT[2 * run:3 * run]
            vbits = geT[3 * run:4 * run]
        else:
            c = geT[0:run]
            vbits = geT[run:2 * run]
        v = jax.lax.bitcast_convert_type(vbits, jnp.float32)
        valid = c >= 0
        key = lr_ref[e_local][None, :] * n + c
        hi, lo = _two_prod_k(av_ref[e_local][None, :], v)
        sl = pl.ds(base + e_local * run, run)
        out_k_ref[sl, :] = jnp.where(valid, key, SENTINEL)
        out_hi_ref[sl, :] = jnp.where(valid, hi, 0.0)
        out_lo_ref[sl, :] = jnp.where(valid, lo, 0.0)

    def sort_all():
        sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
        k, hi, lo = bitonic._bitonic_sort_t2(
            out_k_ref[:], out_hi_ref[:], out_lo_ref[:], sub, width,
            start_kk, static_strides)
        out_k_ref[:] = k
        out_hi_ref[:] = hi
        out_lo_ref[:] = lo

    pad = width - ka * run
    if ka_blocks == 1:
        for e in range(ka):
            emit(e, e, 0)
        if pad:
            out_k_ref[ka * run:, :] = jnp.full((pad, L), SENTINEL,
                                               jnp.int32)
            out_hi_ref[ka * run:, :] = jnp.zeros((pad, L), jnp.float32)
            out_lo_ref[ka * run:, :] = jnp.zeros((pad, L), jnp.float32)
        sort_all()
        return
    j = pl.program_id(1)
    ka_blk = g_ref.shape[0]
    base = j * ka_blk * run
    for e in range(ka_blk):
        emit(e, e, base)

    @pl.when(j == ka_blocks - 1)
    def _():
        if pad:
            out_k_ref[ka * run:, :] = jnp.full((pad, L), SENTINEL,
                                               jnp.int32)
            out_hi_ref[ka * run:, :] = jnp.zeros((pad, L), jnp.float32)
            out_lo_ref[ka * run:, :] = jnp.zeros((pad, L), jnp.float32)
        sort_all()


def _compress_kernel_t_dd(key_ref, hi_ref, lo_ref, out_col_ref,
                          out_hi_ref, out_lo_ref, nnz_ref, *,
                          width: int, static_strides: bool):
    """bitonic._compress_kernel_t with double-double accumulation: the
    segmented duplicate-run scan runs under two-sum, and the rank/omega
    compaction routes both value lanes."""
    L = key_ref.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (width, L), 0)
    k = key_ref[:]
    hi = hi_ref[:]
    lo = lo_ref[:]
    log_w = width.bit_length() - 1

    head = (sub == 0) | (k != pltpu.roll(k, 1, axis=0))

    def scan_body(t, carry):
        shi, slo, f = carry
        d = jnp.int32(1) << t if not static_strides else t
        edge = sub < d
        hi_sh = jnp.where(edge, 0.0, pltpu.roll(shi, d, axis=0))
        lo_sh = jnp.where(edge, 0.0, pltpu.roll(slo, d, axis=0))
        f_sh = jnp.where(edge, 1, pltpu.roll(f, d, axis=0))
        nhi, nlo = _two_sum_k(shi, slo, hi_sh, lo_sh)
        shi = jnp.where(f > 0, shi, nhi)
        slo = jnp.where(f > 0, slo, nlo)
        return shi, slo, f | f_sh

    if static_strides:
        carry = (hi, lo, head.astype(jnp.int32))
        d = 1
        while d < width:
            carry = scan_body(d, carry)
            d *= 2
        shi, slo, _ = carry
    else:
        shi, slo, _ = jax.lax.fori_loop(
            0, log_w, scan_body, (hi, lo, head.astype(jnp.int32)))

    is_last = ((sub == width - 1)
               | (k != pltpu.roll(k, width - 1, axis=0)))
    emit = is_last & (k != SENTINEL)
    nnz_ref[:] = jnp.sum(emit.astype(jnp.int32), axis=0,
                         keepdims=True).T

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
    h2 = jnp.where(emit, shi, 0.0)
    l2 = jnp.where(emit, slo, 0.0)
    dest = jnp.where(emit, rank - 1, -1)

    def route_body(t, carry):
        k2, h2, l2, dest = carry
        bit = jnp.int32(1) << t if not static_strides else t
        up = (sub & bit) == 0
        back = width - bit

        def partner(x):
            return jnp.where(up, pltpu.roll(x, back, axis=0),
                             pltpu.roll(x, bit, axis=0))

        pd = partner(dest)
        pk = partner(k2)
        ph = partner(h2)
        plo = partner(l2)
        crossing = (dest >= 0) & (((sub ^ dest) & bit) > 0)
        p_crossing = (pd >= 0) & (((sub ^ pd) & bit) == 0)
        keep = (dest >= 0) & ~crossing
        nk = jnp.where(p_crossing, pk, jnp.where(keep, k2, SENTINEL))
        nh = jnp.where(p_crossing, ph, jnp.where(keep, h2, 0.0))
        nl = jnp.where(p_crossing, plo, jnp.where(keep, l2, 0.0))
        nd = jnp.where(p_crossing, pd, jnp.where(keep, dest, -1))
        return nk, nh, nl, nd

    if static_strides:
        carry = (k2, h2, l2, dest)
        bit = 1
        while bit < width:
            carry = route_body(bit, carry)
            bit *= 2
        k2, h2, l2, _ = carry
    else:
        k2, h2, l2, _ = jax.lax.fori_loop(0, log_w, route_body,
                                          (k2, h2, l2, dest))

    out_col_ref[:] = jnp.where(k2 == SENTINEL, -1, k2)
    out_hi_ref[:] = jnp.where(k2 == SENTINEL, 0.0, h2)
    out_lo_ref[:] = jnp.where(k2 == SENTINEL, 0.0, l2)


@functools.partial(jax.jit,
                   static_argnames=("width", "run", "ka", "n", "start_kk",
                                    "interpret", "static_strides"))
def _slab_sort_compress_dd(g, avT, lrT, *, width: int, run: int, ka: int,
                           n: int, start_kk: int, interpret: bool,
                           static_strides: bool = True):
    """_slab_sort_compress with (hi, lo) value lanes throughout."""
    static_strides = static_strides and not interpret
    S = avT.shape[1]
    lanes = g.shape[2]
    L = _TILE_LANES
    ka_blocks = 1
    ka_blk = ka
    while ka_blk * lanes > _EXPAND_TILE_ELEMS and ka_blk % 2 == 0:
        ka_blk //= 2
        ka_blocks *= 2
    if ka_blocks == 1:
        grid = (pl.cdiv(S, L),)
        gspec = pl.BlockSpec((ka, L, lanes), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        fspec = pl.BlockSpec((ka, L), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        colt = lambda h: pl.BlockSpec(  # noqa: E731
            (h, L), lambda i: (0, i), memory_space=pltpu.VMEM)
    else:
        grid = (pl.cdiv(S, L), ka_blocks)
        gspec = pl.BlockSpec((ka_blk, L, lanes), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM)
        fspec = pl.BlockSpec((ka_blk, L), lambda i, j: (j, i),
                             memory_space=pltpu.VMEM)
        colt = lambda h: pl.BlockSpec(  # noqa: E731
            (h, L), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    k_s, hi_s, lo_s = pl.pallas_call(
        functools.partial(_expand_sort_kernel_lr_dd, ka=ka, run=run,
                          width=width, n=n, start_kk=start_kk,
                          static_strides=static_strides,
                          ka_blocks=ka_blocks),
        grid=grid,
        in_specs=[gspec, fspec, fspec],
        out_specs=(colt(width), colt(width), colt(width)),
        out_shape=(jax.ShapeDtypeStruct((width, S), jnp.int32),
                   jax.ShapeDtypeStruct((width, S), jnp.float32),
                   jax.ShapeDtypeStruct((width, S), jnp.float32)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=interpret,
    )(g, avT, lrT)
    c1 = lambda h: pl.BlockSpec(  # noqa: E731
        (h, L), lambda i: (0, i), memory_space=pltpu.VMEM)
    key_t, hi_t, lo_t, nnz = pl.pallas_call(
        functools.partial(_compress_kernel_t_dd, width=width,
                          static_strides=static_strides),
        grid=(pl.cdiv(S, L),),
        in_specs=[c1(width), c1(width), c1(width)],
        out_specs=(c1(width), c1(width), c1(width),
                   pl.BlockSpec((L, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((width, S), jnp.int32),
                   jax.ShapeDtypeStruct((width, S), jnp.float32),
                   jax.ShapeDtypeStruct((width, S), jnp.float32),
                   jax.ShapeDtypeStruct((S, 1), jnp.int32)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_FUSED_VMEM_LIMIT),
        interpret=interpret,
    )(k_s, hi_s, lo_s)
    return key_t.T, hi_t.T, lo_t.T, nnz


@functools.partial(jax.jit,
                   static_argnames=("F_c", "lanes", "W", "run", "n",
                                    "interpret", "static"))
def _slab_run_dd(table, mt, avt, lrt, *, F_c: int, lanes: int, W: int,
                 run: int, n: int, interpret: bool, static: bool):
    S_pad = avt.shape[1]
    g = table[mt.reshape(-1)].reshape(F_c, S_pad, lanes)
    keys, his, los, nnz_s = _slab_sort_compress_dd(
        g, avt, lrt, width=W, run=run, ka=F_c, n=n,
        start_kk=2 * run, interpret=interpret, static_strides=static)
    return keys, his, los, nnz_s, jnp.sum(nnz_s[:, 0]).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n", "out_cap"))
def _compact_xla(keys, vals, nnz_s, sfr, *, n: int, out_cap: int):
    """Slab concatenation as an XLA drop-mode scatter (~per-element
    cost): out position base[s] + t for survivor t of slab s."""
    S, W = keys.shape
    base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(nnz_s[:, 0], dtype=jnp.int32)])
    t = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)
    ok = t < nnz_s
    dst = jnp.where(ok, base[:-1, None] + t, out_cap).reshape(-1)
    lrow = jnp.floor_divide(keys, n)
    rows = jnp.where(ok, sfr + lrow, 0).reshape(-1)
    cols = jnp.where(ok, keys - lrow * n, 0).reshape(-1)
    vv = jnp.where(ok, vals, 0).reshape(-1)
    out_r = jnp.zeros((out_cap + 1,), jnp.int32).at[dst].set(rows,
                                                             mode="drop")
    out_c = jnp.zeros((out_cap + 1,), jnp.int32).at[dst].set(cols,
                                                             mode="drop")
    out_v = jnp.zeros((out_cap + 1,), vals.dtype).at[dst].set(vv,
                                                              mode="drop")
    return out_r, out_c, out_v


def _compact_gather(keys, vals, nnz_s, sfr, *, n: int, out_cap: int,
                    vals_lo=None):
    """Slab concatenation INVERTED: per-OUTPUT-position source gather.

    _compact_xla's three drop-mode scatters run ~30 ns/element (637 ms
    on the acceptance workload, headline_rooflines.json r4). The
    output→source map is piecewise-linear — within slab s, output
    base[s]+t reads slot t — so src(p) = p + off(p) where off jumps
    only at slab starts. off is built with one S-sized telescoping
    scatter + a cumsum (the _device_fragments pattern), and the payload
    moves through flat gathers instead of scatters. Tail positions
    (p >= total) clip to the last element and are masked by
    _finalize_csr. Row ids are arithmetic on the gathered keys (no
    third array pass)."""
    S, W = keys.shape
    counts = nnz_s[:, 0]
    base = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts, dtype=jnp.int32)])
    # off deltas at each slab's first output position (empty slabs
    # stack their deltas on the same position — add-mode telescoping)
    offs = (jax.lax.iota(jnp.int32, S) * W - base[:-1])
    d_off = offs - jnp.pad(offs[:-1], (1, 0))
    sfr_d = sfr[:, 0] - jnp.pad(sfr[:-1, 0], (1, 0))
    pos_s = jnp.minimum(base[:-1], out_cap)
    g_off = jnp.zeros((out_cap + 1,), jnp.int32
                      ).at[pos_s].add(d_off, mode="drop")
    g_sfr = jnp.zeros((out_cap + 1,), jnp.int32
                      ).at[pos_s].add(sfr_d, mode="drop")
    p = jax.lax.iota(jnp.int32, out_cap)
    src = jnp.clip(p + jnp.cumsum(g_off[:out_cap]), 0, S * W - 1)
    sfr_p = jnp.cumsum(g_sfr[:out_cap])        # slab_first_row per pos
    k = jnp.take(keys.reshape(-1), src)
    vv = jnp.take(vals.reshape(-1), src)
    lrow = jnp.floor_divide(k, n)
    rows = jnp.pad(sfr_p + lrow, (0, 1))
    cols = jnp.pad(k - lrow * n, (0, 1))
    out_v = jnp.pad(vv, (0, 1))
    if vals_lo is not None:
        return rows, cols, out_v, jnp.pad(
            jnp.take(vals_lo.reshape(-1), src), (0, 1))
    return rows, cols, out_v


@functools.partial(jax.jit, static_argnames=("m", "n", "out_cap"))
def _finalize_csr(rows_raw, cols_raw, vals_raw, total,
                  *, m: int, n: int, out_cap: int):
    """Mask the uninitialized/garbage tail past the exact nnz, then
    derive row_ptr from the (ascending) compacted row stream."""
    o = jax.lax.iota(jnp.int32, out_cap)
    live = o < total
    rows = jnp.where(live, rows_raw[:out_cap], m)
    col = jnp.where(live, cols_raw[:out_cap], n)
    val = jnp.where(live, vals_raw[:out_cap], 0.0)
    row_ptr = jnp.searchsorted(
        rows, jnp.arange(m + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return row_ptr, col, val


# identity-keyed build cache (same contract as bitonic._BUILD_CACHE):
# jax arrays are immutable, so identical operand objects imply identical
# content; each live entry's runner closes over its operands, pinning
# the ids. FIFO-bounded so dead plans can't hoard HBM.
_BUILD_CACHE: dict = {}
_BUILD_CACHE_MAX = 2


def clear_plan_cache():
    _BUILD_CACHE.clear()


def plan_slab_csr(A: CSR, B: CSR, *, width: int | None = None,
                  run: int | None = None,
                  interpret: bool | None = None, dd: bool = False):
    key = (id(A.row_ptr), id(A.col_ind), id(A.values),
           id(B.row_ptr), id(B.col_ind), id(B.values),
           width, run, interpret, dd)
    hit = _BUILD_CACHE.get(key)
    if hit is not None:
        return hit[0]
    call = _plan_slab_csr_uncached(A, B, width=width, run=run,
                                   interpret=interpret, dd=dd)
    if len(_BUILD_CACHE) >= _BUILD_CACHE_MAX:
        _BUILD_CACHE.pop(next(iter(_BUILD_CACHE)))
    # anchors pinned explicitly: a None (inviable) result closes over
    # nothing, so the ids must be kept alive by the cache itself
    _BUILD_CACHE[key] = (call, (A.row_ptr, A.col_ind, A.values,
                                B.row_ptr, B.col_ind, B.values))
    return call


def _plan_slab_csr_uncached(A: CSR, B: CSR, *, width: int | None = None,
                            run: int | None = None,
                            interpret: bool | None = None,
                            dd: bool = False):
    """Host-plan the slab engine for C = A @ B (both CSR, f32) and return
    a zero-argument runner producing an exact CSR — or None when the
    engine is not viable (non-f32, a row's padded products exceed the
    slab width cap, or the padded volume blows the budget).

    dd=True runs the compensated pipeline: exact Dekker (hi, lo)
    products, two-value-lane sort, two-sum compress — fp64-grade sums
    (~2^-48 relative) at slab-engine bandwidth instead of the global
    sort's (VERDICT r4 #6). Output SlabCSR carries values_lo.

    All planning is nnz-scaled host numpy (~ms at half-million nnz) —
    no per-candidate device probing, no device readbacks."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    if (A.values.dtype != jnp.float32 or B.values.dtype != jnp.float32):
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    run = int(run) if run else DEFAULT_RUN
    m, n = A.nrows, B.ncols
    nnzA = int(A.nnz)
    if nnzA == 0 or int(B.nnz) == 0:
        return None  # trivial problems stay on the general engine
    from ia_spgemm_tpu.utils import hostcache
    a_rp = hostcache.host_view(A.row_ptr).astype(np.int64)
    a_col = hostcache.host_view(A.col_ind)[:nnzA].astype(np.int64)
    a_val = hostcache.host_view(A.values)[:nnzA].astype(np.float32)
    b_len = np.diff(hostcache.host_view(B.row_ptr)).astype(np.int64)

    e_len = b_len[np.clip(a_col, 0, B.nrows - 1)]
    frag_e = -(-e_len // run)                       # 0 for empty B rows
    ecs = np.concatenate([[0], np.cumsum(frag_e)])
    prf = (ecs[a_rp[1:]] - ecs[a_rp[:-1]]) * run    # padded row products
    rf = np.concatenate([[0], np.cumsum(e_len)])
    rf = rf[a_rp[1:]] - rf[a_rp[:-1]]               # true row products
    max_prf = int(prf.max(initial=0))
    if max_prf == 0:
        return None
    W = int(width) if width else max(
        SLAB_MIN_WIDTH, bitonic._next_pow2(max_prf))
    if max_prf > W or W > SLAB_MAX_WIDTH:
        return None

    # greedy packing of NONEMPTY rows over the padded-flops prefix (the
    # reference's upper_bound over cummulative_row_workspace)
    live_rows = np.nonzero(prf > 0)[0]
    pl_live = prf[live_rows]
    csum = np.concatenate([[0], np.cumsum(pl_live)])
    bounds = [0]
    nlive = len(live_rows)
    while bounds[-1] < nlive:
        r0 = bounds[-1]
        r1 = int(np.searchsorted(csum, csum[r0] + W, side="right")) - 1
        bounds.append(max(r1, r0 + 1))
    n_slabs = len(bounds) - 1
    S_pad = -(-n_slabs // _TILE_LANES) * _TILE_LANES
    F_c = W // run
    if S_pad * W > SLAB_ELEMS_BUDGET:
        return None
    bounds = np.asarray(bounds, dtype=np.int64)
    slab_of = np.repeat(np.arange(n_slabs, dtype=np.int64),
                        np.diff(bounds))                   # per live row
    # local row = GLOBAL row offset from the slab's first row (empty
    # rows inside a slab's span keep their gap, so the decode
    # slab_first_row + key//n lands on the true global row)
    first_row = live_rows[bounds[:-1]]                     # per slab
    lrow_of = live_rows - first_row[slab_of]
    rspan = int(lrow_of.max(initial=0)) + 1
    if rspan * n >= 2**31:
        return None  # slab-local keys must fit int32 below SENTINEL

    # B's fragment grid + packed table (pre-reversed runs, 128 lanes)
    from ia_spgemm_tpu.formats import convert
    kb = convert.plan_ell_width(B)
    if B.nrows * max(kb, 1) > (1 << 28):
        return None
    cm = max(-(-kb // run), 1)
    b_cnt = -(-b_len // run)
    startp = np.concatenate([[0], np.cumsum(b_cnt)])
    F_B = int(startp[-1])
    js = np.repeat(np.arange(len(b_cnt)), b_cnt)
    within_b = np.arange(F_B) - np.repeat(startp[:-1], b_cnt)
    frag_src = js * cm + within_b

    # global fragment stream over A's entries -> (slab, fragment-slot)
    F_total = int(ecs[-1])
    src_e = np.repeat(np.arange(nnzA, dtype=np.int64), frag_e)
    within = np.arange(F_total, dtype=np.int64) \
        - np.repeat(ecs[:-1], frag_e)
    mval = startp[a_col[src_e]] + within                # table row ids
    row_of_e = np.repeat(np.arange(m, dtype=np.int64), np.diff(a_rp))
    rows_f = row_of_e[src_e]
    # dense row -> live-rank map (empty rows never carry fragments)
    live_rank = np.zeros(m, np.int64)
    live_rank[live_rows] = np.arange(nlive)
    lr_f = live_rank[rows_f]
    # per-fragment slot inside its slab: global stream position minus
    # the slab's stream start (the fragment cumsum at the slab's first
    # live row's first entry)
    slab_f = slab_of[lr_f]
    slab_stream_start = ecs[a_rp[live_rows[bounds[:-1]]]]
    fpos = np.arange(F_total, dtype=np.int64) \
        - slab_stream_start[slab_f]

    tgt = slab_f * F_c + fpos
    M_flat = np.full(S_pad * F_c, F_B, np.int32)
    AV_flat = np.zeros(S_pad * F_c, np.float32)
    LR_flat = np.zeros(S_pad * F_c, np.int32)
    M_flat[tgt] = mval.astype(np.int32)
    AV_flat[tgt] = a_val[src_e]
    LR_flat[tgt] = lrow_of[lr_f].astype(np.int32)

    mt = jnp.asarray(np.ascontiguousarray(
        M_flat.reshape(S_pad, F_c).T))
    avt = jnp.asarray(np.ascontiguousarray(
        AV_flat.reshape(S_pad, F_c).T))
    lrt = jnp.asarray(np.ascontiguousarray(
        LR_flat.reshape(S_pad, F_c).T))

    B_ell = convert.csr_to_ell(B, width=kb, check_guard=False)
    table = bitonic._ragged_table(
        B_ell.col_ind, B_ell.values,
        jnp.asarray(frag_src.astype(np.int32)), run=run, cm=cm)

    sfr_h = np.zeros((S_pad, 1), np.int32)
    sfr_h[:n_slabs, 0] = live_rows[bounds[:-1]]
    sfr = jnp.asarray(sfr_h)

    nnz_bound = int(np.minimum(rf, n).sum())
    out_cap = cfg.bucket_capacity(max(nnz_bound, 1))
    if out_cap + W >= 2**31:
        return None

    plan = SlabPlan(width=W, run=run, n_slabs=S_pad, out_cap=out_cap,
                    nnz_bound=nnz_bound, m=m, n=n,
                    padded_slots=S_pad * W,
                    true_flops=int(e_len.sum()),
                    mt=mt, avt=avt, lrt=lrt, table=table,
                    slab_first_row=sfr)
    shape = (m, n)
    lanes = int(table.shape[1])
    static = W <= _COLS_STATIC_MAX_WIDTH

    if dd:
        def call() -> SlabCSR:
            keys, his, los, nnz_s, total = _slab_run_dd(
                plan.table, plan.mt, plan.avt, plan.lrt, F_c=F_c,
                lanes=lanes, W=W, run=run, n=n, interpret=interpret,
                static=static)
            return SlabCSR(keys=keys, values=his, values_lo=los,
                           nnz_slab=nnz_s[:, 0],
                           slab_first_row=plan.slab_first_row[:, 0],
                           nnz=total, shape=shape)
    else:
        def call() -> SlabCSR:
            keys, vals, nnz_s, total = _slab_run(
                plan.table, plan.mt, plan.avt, plan.lrt, F_c=F_c,
                lanes=lanes, W=W, run=run, n=n, interpret=interpret,
                static=static)
            return SlabCSR(keys=keys, values=vals, nnz_slab=nnz_s[:, 0],
                           slab_first_row=plan.slab_first_row[:, 0],
                           nnz=total, shape=shape)

    call.plan = plan
    return call


def slab_to_csr(C: SlabCSR, *, out_cap: int | None = None,
                engine: str = "gather") -> CSR:
    """Flatten a SlabCSR to exact device CSR.

    Priced conversion (like convert.bcsr_to_csr), NOT part of the
    engine's hot path; use the SlabCSR directly (checksum/to_scipy are
    exact) when a flat layout isn't required. engine="gather" (default)
    inverts the concatenation into flat gathers (see _compact_gather);
    engine="scatter" keeps the drop-mode XLA scatter formulation as the
    A/B baseline."""
    m, n = C.shape
    if out_cap is None:
        out_cap = cfg.bucket_capacity(max(int(C.keys.shape[0])
                                          * int(C.keys.shape[1]), 1))
        # the exact nnz is a device scalar; cap by the grid size
    if engine == "gather":
        parts = _compact_gather(
            C.keys, C.values, C.nnz_slab[:, None],
            C.slab_first_row[:, None], n=n, out_cap=out_cap,
            vals_lo=C.values_lo)
        rows_raw, cols_raw, vals_raw = parts[:3]
        lo_raw = parts[3] if C.values_lo is not None else None
    else:
        rows_raw, cols_raw, vals_raw = _compact_xla(
            C.keys, C.values, C.nnz_slab[:, None],
            C.slab_first_row[:, None], n=n, out_cap=out_cap)
        lo_raw = None
        if C.values_lo is not None:
            _, _, lo_raw = _compact_xla(
                C.keys, C.values_lo, C.nnz_slab[:, None],
                C.slab_first_row[:, None], n=n, out_cap=out_cap)
    row_ptr, col, val = _finalize_csr(
        rows_raw, cols_raw, vals_raw, C.nnz, m=m, n=n, out_cap=out_cap)
    val_lo = None
    if lo_raw is not None:
        val_lo = jnp.where(
            jax.lax.iota(jnp.int32, out_cap) < C.nnz,
            lo_raw[:out_cap], 0.0)
    return CSR(row_ptr=row_ptr, col_ind=col, values=val,
               values_lo=val_lo, nnz=C.nnz, shape=C.shape)


def spgemm_csr_slab(A: CSR, B: CSR, *, width: int | None = None,
                    run: int | None = None,
                    interpret: bool | None = None):
    """C = A @ B through the slab engine (native SlabCSR out); None when
    not viable."""
    call = plan_slab_csr(A, B, width=width, run=run, interpret=interpret)
    return call() if call is not None else None


@struct.dataclass
class HybridCSR:
    """Disjoint-row composition of a SlabCSR (light rows) and a CSR
    (heavy-row residual) — the slab/global hybrid's native output.
    Exact: the parts cover disjoint row sets. A flax.struct pytree so
    jax.block_until_ready / profiling.force see its arrays."""
    light: SlabCSR
    heavy: "CSR"
    shape: tuple = struct.field(pytree_node=False)

    @property
    def nrows(self) -> int:
        return self.shape[0]

    @property
    def ncols(self) -> int:
        return self.shape[1]

    @property
    def nnz(self):
        return self.light.nnz + self.heavy.nnz

    def checksum(self):
        return self.light.checksum() + self.heavy.checksum()

    def to_scipy(self):
        return (self.light.to_scipy() + self.heavy.to_scipy()).tocsr()


def plan_slab_hybrid(A: CSR, B: CSR, *,
                     interpret: bool | None = None):
    """Slab engine for the rows it admits + the global-sort engine for
    the heavy residual (rows whose padded products exceed the slab
    width cap) — the ESC fallback that stays fast on skewed inputs.

    The reference's sliced ESC partitions rows by workspace
    (coo_dev/common_coo_dev.h:388-421); this partitions by VMEM sort
    width: on the measured skew workload 99.7% of rows (and ~40% of E)
    ride the slab engine while the ~0.3% heavy rows take the global
    sort at a fraction of the full problem's expansion. Returns a
    zero-arg runner producing HybridCSR, or None when A has no heavy
    rows (plain plan_slab_csr applies) or the light part is inviable."""
    from ia_spgemm_tpu.ops import esc as esc_mod
    from ia_spgemm_tpu.utils import hostcache
    if (A.values.dtype != jnp.float32 or B.values.dtype != jnp.float32):
        return None
    nnzA = int(A.nnz)
    if nnzA == 0:
        return None
    run = DEFAULT_RUN
    a_rp = hostcache.host_view(A.row_ptr).astype(np.int64)
    a_col = hostcache.host_view(A.col_ind)[:nnzA].astype(np.int64)
    a_val = hostcache.host_view(A.values)[:nnzA]
    b_len = np.diff(hostcache.host_view(B.row_ptr)).astype(np.int64)
    e_len = b_len[np.clip(a_col, 0, B.nrows - 1)]
    frag_e = -(-e_len // run)
    ecs = np.concatenate([[0], np.cumsum(frag_e)])
    prf = (ecs[a_rp[1:]] - ecs[a_rp[:-1]]) * run
    heavy = prf > SLAB_MAX_WIDTH
    n_heavy = int(heavy.sum())
    if n_heavy == 0 or n_heavy == A.nrows:
        return None

    def split(mask):
        rl = np.diff(a_rp) * mask
        rp = np.concatenate([[0], np.cumsum(rl)]).astype(np.int64)
        keep = np.repeat(mask, np.diff(a_rp))
        total = int(rp[-1])
        col = np.full(max(total, 1), A.ncols, np.int32)
        val = np.zeros(max(total, 1), a_val.dtype)
        col[:total] = a_col[keep]
        val[:total] = a_val[keep]
        return CSR.from_arrays(rp.astype(np.int32), col, val,
                               A.shape, nnz=total)

    A_light = split(~heavy)
    A_heavy = split(heavy)
    light_call = plan_slab_csr(A_light, B, interpret=interpret)
    if light_call is None:
        return None
    heavy_plan = esc_mod.plan_spgemm(A_heavy, B)
    shape = (A.nrows, B.ncols)

    def call() -> HybridCSR:
        return HybridCSR(
            light=light_call(),
            heavy=esc_mod.spgemm_csr(A_heavy, B, heavy_plan,
                                     engine="global"),
            shape=shape)

    call.n_heavy = n_heavy
    return call
