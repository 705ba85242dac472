"""Pallas hash-accumulator SpGEMM (the NSPARSE class slot).

Completes the accumulation-strategy taxonomy (SURVEY.md §2.3): the
reference's COO kernel linear-probes the output row in place
(coo/common_coo.h:124-159) and its CSR/ELL kernels chase per-thread linked
lists; the reference also NAMES an NSPARSE hash-class algorithm it never
implements (main.cu:526,543-544). The TPU analogue keeps an
open-addressing hash table per output row in SMEM (scalar memory — the
only space allowing dynamic per-element addressing) and probes it with
the classic multiply-shift hash + linear stride.

Round 2: B is STREAMED from HBM by double-buffered async DMA (aligned
8-row groups of its packed ELL table), so only the per-tile hash tables
occupy SMEM — m = 32768 operands are viable (round 1 required BOTH
operands resident in SMEM, capping it at toy sizes).

Perf bound (measured round 4, reports/hash_win.json): ~46 ns/insert of
scalar SMEM probing on v5e. Even in the regime engineered to favor
probing — per-row products past the sort engines' 16384-lane width cap
(flat/multiclass/slab all inviable) with a 20x duplicate collapse into
narrow rows — the vectorized global-sort ESC fallback is 3.8x faster
(1.02 s vs 3.90 s device at E=84M), and that workload's fully-dense C
really belongs to the MXU dense route (~2 ms of matmul). On TPU the
hash/NSPARSE class is correctly served by the sort-based kernels
(ops/bitonic.py); this kernel is the taxonomy's scalar-probing exhibit
at full scale, not a speed record.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ia_spgemm_tpu.formats.types import ELL

DEFAULT_TILE_ROWS = 8
# SMEM budget for the per-tile hash tables (B no longer lives in SMEM).
SMEM_BUDGET_BYTES = 256 * 1024

_HASH_MULT = 2654435761 - 2**32  # Knuth multiplicative hash, as signed i32


def hash_viable(ka: int, kb: int, ncols: int,
                tile_rows: int = DEFAULT_TILE_ROWS) -> bool:
    """True when the per-tile hash tables + B stream buffers fit SMEM —
    the same arithmetic spgemm_hash itself performs before launching."""
    H = max(min(_next_pow2(2 * max(ka, 1) * max(kb, 1)),
                _next_pow2(2 * max(ncols, 1))), 8)
    t_bytes = tile_rows * H * 8 \
        + 2 * 8 * 2 * max(_next_pow2(max(kb, 1)), 128) * 4
    return t_bytes <= SMEM_BUDGET_BYTES


def _kernel(a_col_ref, a_val_ref, bc_hbm_ref, bv_hbm_ref,
            out_col_ref, out_val_ref, out_nnz_ref, bbuf_c, bbuf_v, sem,
            *, kb_pad: int):
    tile_rows, Ka = a_col_ref.shape
    H = out_col_ref.shape[1]
    k_groups = bc_hbm_ref.shape[0] // 8
    total = tile_rows * Ka

    # clear tables
    def clear(r, _):
        def clear_h(h, _):
            out_col_ref[r, h] = -1
            out_val_ref[r, h] = 0.0
            return 0
        jax.lax.fori_loop(0, H, clear_h, 0)
        out_nnz_ref[r, 0] = 0
        return 0
    jax.lax.fori_loop(0, tile_rows, clear, 0)

    def acol_at(idx):
        r = idx // Ka
        ka = idx - r * Ka
        # clamp: rows past m in the LAST grid tile carry garbage
        return r, jnp.clip(a_col_ref[r, ka], -1, bc_hbm_ref.shape[0] - 1)

    def get_dmas(slot, idx):
        # col and value planes travel as SEPARATE same-typed DMAs:
        # SMEM loads are scalars and Mosaic's tpu.bitcast is vector-only,
        # so an i32-packed value plane could never be reinterpreted f32
        # inside the kernel (caught by /verify on the real chip)
        _, acol = acol_at(idx)
        grp = jnp.clip(jnp.where(acol >= 0, acol, 0) // 8, 0,
                       k_groups - 1).astype(jnp.int32)
        # aligned 8-row group of B's ELL col/val tables
        return (pltpu.make_async_copy(
            bc_hbm_ref.at[pl.ds(grp * 8, 8)], bbuf_c.at[slot],
            sem.at[slot, 0]),
            pltpu.make_async_copy(
            bv_hbm_ref.at[pl.ds(grp * 8, 8)], bbuf_v.at[slot],
            sem.at[slot, 1]))

    for dma in get_dmas(0, 0):
        dma.start()

    def body(idx, _):
        slot = jax.lax.rem(idx, 2)
        nxt = jax.lax.rem(idx + 1, 2)

        @pl.when(idx + 1 < total)
        def _():
            for dma in get_dmas(nxt, idx + 1):
                dma.start()

        for dma in get_dmas(slot, idx):
            dma.wait()
        r, acol = acol_at(idx)
        ka = idx - r * Ka
        aval = a_val_ref[r, ka]
        rr = jax.lax.rem(jnp.where(acol >= 0, acol, 0),
                         jnp.asarray(8, acol.dtype))

        @pl.when(acol >= 0)
        def _():
            def b_slot(kb, _):
                j = bbuf_c[slot, rr, kb]

                @pl.when(j >= 0)
                def _():
                    v = aval * bbuf_v[slot, rr, kb]
                    h0 = jax.lax.rem(
                        (j * jnp.int32(_HASH_MULT)) & jnp.int32(2**31 - 1),
                        jnp.int32(H))

                    # linear probe: stop at empty (-1) or matching slot
                    def cond(state):
                        h, done = state
                        return ~done

                    def step(state):
                        h, _ = state
                        cur = out_col_ref[r, h]
                        hit = (cur == j) | (cur == -1)

                        @pl.when(hit)
                        def _():
                            out_col_ref[r, h] = j

                            @pl.when(cur == -1)
                            def _():
                                out_nnz_ref[r, 0] += 1
                            out_val_ref[r, h] += v
                        nh = jax.lax.rem(h + 1, jnp.int32(H))
                        return (jnp.where(hit, h, nh), hit)

                    jax.lax.while_loop(cond, step, (h0, jnp.bool_(False)))
                return 0
            jax.lax.fori_loop(0, kb_pad, b_slot, 0)
        return 0
    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit, static_argnames=("table_size", "tile_rows",
                                             "interpret", "kb_pad"))
def _hash_call(a_col, a_val, b_col, b_val, *, table_size: int,
               tile_rows: int, interpret: bool, kb_pad: int):
    m, Ka = a_col.shape
    grid = (pl.cdiv(m, tile_rows),)
    smem_tile = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_kernel, kb_pad=kb_pad),
        grid=grid,
        in_specs=[smem_tile((tile_rows, Ka)), smem_tile((tile_rows, Ka)),
                  pl.BlockSpec(memory_space=pl.ANY),    # B stays in HBM
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(smem_tile((tile_rows, table_size)),
                   smem_tile((tile_rows, table_size)),
                   smem_tile((tile_rows, 1))),
        out_shape=(jax.ShapeDtypeStruct((m, table_size), jnp.int32),
                   jax.ShapeDtypeStruct((m, table_size), jnp.float32),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32)),
        scratch_shapes=[
            pltpu.SMEM((2, 8, kb_pad), jnp.int32),    # DMA'd B cols
            pltpu.SMEM((2, 8, kb_pad), jnp.float32),  # DMA'd B values
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(a_col, a_val, b_col, b_val)


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def spgemm_hash(A: ELL, B: ELL, *, table_size: int | None = None,
                tile_rows: int = DEFAULT_TILE_ROWS,
                interpret: bool | None = None) -> ELL:
    """C = A @ B via per-row SMEM hash accumulation with DMA-streamed B.
    Returns ELL with hash-ordered slots (use .to_scipy() / ell_to_csr for
    canonical order). f32 compute."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    for v in (A.values, B.values):
        if jnp.dtype(v.dtype).itemsize > 4:
            raise ValueError(
                f"spgemm_hash computes in f32 (packed int32 value bits); "
                f"got {v.dtype}. Cast explicitly or use the ESC/bitonic "
                "paths, which keep f64/compensated accumulation.")
    Ka, Kb = A.max_nnz_per_row, B.max_nnz_per_row
    # upper bound on a row's nnz, padded for load factor
    H = table_size or min(_next_pow2(2 * Ka * Kb), _next_pow2(2 * B.ncols))
    H = max(H, 8)
    t_bytes = tile_rows * H * 8 \
        + 2 * 8 * 2 * max(_next_pow2(max(Kb, 1)), 128) * 4
    if t_bytes > SMEM_BUDGET_BYTES:
        raise ValueError(
            f"hash tables exceed the SMEM budget ({t_bytes} > "
            f"{SMEM_BUDGET_BYTES}); use the ESC/bitonic paths")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # B's ELL col/val planes, rows padded to an 8-row DMA-aligned group
    # count (separate same-typed arrays: SMEM loads are scalars, and a
    # bit-packed value plane cannot be reinterpreted f32 in the kernel —
    # Mosaic's tpu.bitcast is vector-only). Lanes pad to >=128: the HBM
    # planes are laid out in (1,128) tiles and current Mosaic rejects
    # DMA slices narrower than a lane tile ("Slice shape along dimension
    # 1 must be aligned to tiling (128)", caught by /verify on-chip).
    kb_pad = max(_next_pow2(max(Kb, 1)), 128)
    k = B.col_ind.shape[0]
    k_pad = -(-k // 8) * 8
    bc = jnp.pad(B.col_ind, ((0, k_pad - k), (0, kb_pad - Kb)),
                 constant_values=-1)
    bv = jnp.pad(B.values.astype(jnp.float32),
                 ((0, k_pad - k), (0, kb_pad - Kb)))
    col, val, nnz_row = _hash_call(
        A.col_ind, A.values.astype(jnp.float32), bc, bv,
        table_size=H, tile_rows=tile_rows, interpret=interpret,
        kb_pad=kb_pad)
    return ELL(col_ind=col, values=val, nnz_row=nnz_row[:, 0],
               nnz=jnp.sum(nnz_row).astype(jnp.int32),
               shape=(A.nrows, B.ncols))
