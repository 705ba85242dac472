"""Pallas hash-accumulator SpGEMM.

Completes the accumulation-strategy taxonomy (SURVEY.md §2.3): the
reference's COO kernel linear-probes the output row in place
(coo/common_coo.h:124-159) and its CSR/ELL kernels chase per-thread linked
lists; the TPU analogue keeps an open-addressing hash table per output row
in SMEM (scalar memory — the only space allowing dynamic per-element
addressing; VMEM requires lane-aligned vector access) and probes it with
the classic multiply-shift hash + linear stride.

Scope: a capability/correctness kernel for small-to-moderate operands
(both operands' ELL tables must fit SMEM); the ESC path remains the
performance default for large inputs. Output is ELL-like with hash-order
slots: (col_ind, values) of width H plus per-row nnz.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ia_spgemm_tpu.formats.types import ELL

DEFAULT_TILE_ROWS = 8
# SMEM is scarce; keep B + tables well under ~512 KB.
SMEM_BUDGET_BYTES = 256 * 1024

_HASH_MULT = 2654435761 - 2**32  # Knuth multiplicative hash, as signed i32


def _kernel(a_col_ref, a_val_ref, b_col_ref, b_val_ref,
            out_col_ref, out_val_ref, out_nnz_ref):
    tile_rows, Ka = a_col_ref.shape
    Kb = b_col_ref.shape[1]
    H = out_col_ref.shape[1]

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

    def row_body(r, _):
        def a_slot(ka, _):
            # clamp: rows past m in the LAST grid tile carry garbage —
            # an unclamped acol indexes B's SMEM table out of bounds
            # (observed TPU runtime crash when tile_rows doesn't divide m)
            acol = jnp.clip(a_col_ref[r, ka], -1,
                            b_col_ref.shape[0] - 1)
            aval = a_val_ref[r, ka]

            @pl.when(acol >= 0)
            def _():
                def b_slot(kb, _):
                    j = b_col_ref[acol, kb]
                    bv = b_val_ref[acol, kb]

                    @pl.when(j >= 0)
                    def _():
                        v = aval * bv
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

                            def insert(h):
                                out_col_ref[r, h] = j

                                @pl.when(cur == -1)
                                def _():
                                    out_nnz_ref[r, 0] += 1
                                out_val_ref[r, h] += v

                            @pl.when(hit)
                            def _():
                                insert(h)
                            nh = jax.lax.rem(h + 1, jnp.int32(H))
                            return (jnp.where(hit, h, nh), hit)

                        jax.lax.while_loop(cond, step, (h0, jnp.bool_(False)))
                    return 0
                jax.lax.fori_loop(0, Kb, b_slot, 0)
            return 0
        jax.lax.fori_loop(0, Ka, a_slot, 0)
        return 0
    jax.lax.fori_loop(0, tile_rows, row_body, 0)


@functools.partial(jax.jit, static_argnames=("table_size", "tile_rows",
                                             "interpret"))
def _hash_call(a_col, a_val, b_col, b_val, *, table_size: int,
               tile_rows: int, interpret: bool):
    m, Ka = a_col.shape
    grid = (pl.cdiv(m, tile_rows),)
    smem_tile = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (i, 0), memory_space=pltpu.SMEM)
    full_smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[smem_tile((tile_rows, Ka)), smem_tile((tile_rows, Ka)),
                  full_smem, full_smem],
        out_specs=(smem_tile((tile_rows, table_size)),
                   smem_tile((tile_rows, table_size)),
                   smem_tile((tile_rows, 1))),
        out_shape=(jax.ShapeDtypeStruct((m, table_size), jnp.int32),
                   jax.ShapeDtypeStruct((m, table_size), a_val.dtype),
                   jax.ShapeDtypeStruct((m, 1), jnp.int32)),
        interpret=interpret,
    )(a_col, a_val, b_col, b_val)


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


def spgemm_hash(A: ELL, B: ELL, *, table_size: int | None = None,
                tile_rows: int = DEFAULT_TILE_ROWS,
                interpret: bool | None = None) -> ELL:
    """C = A @ B via per-row SMEM hash accumulation. Returns ELL with
    hash-ordered slots (use .to_scipy() / ell_to_csr for canonical order)."""
    if A.ncols != B.nrows:
        raise ValueError(f"shape mismatch: {A.shape} @ {B.shape}")
    Ka, Kb = A.max_nnz_per_row, B.max_nnz_per_row
    # upper bound on a row's nnz, padded for load factor
    H = table_size or min(_next_pow2(2 * Ka * Kb), _next_pow2(2 * B.ncols))
    H = max(H, 8)
    b_bytes = B.col_ind.size * 4 + B.values.size * B.values.dtype.itemsize
    t_bytes = tile_rows * H * (4 + A.values.dtype.itemsize)
    if b_bytes + t_bytes > SMEM_BUDGET_BYTES:
        raise ValueError(
            f"operands exceed the SMEM hash budget ({b_bytes + t_bytes} > "
            f"{SMEM_BUDGET_BYTES}); use the ESC path")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.result_type(A.values.dtype, B.values.dtype)
    col, val, nnz_row = _hash_call(
        A.col_ind, A.values.astype(dtype), B.col_ind,
        B.values.astype(dtype), table_size=H, tile_rows=tile_rows,
        interpret=interpret)
    return ELL(col_ind=col, values=val, nnz_row=nnz_row[:, 0],
               nnz=jnp.sum(nnz_row).astype(jnp.int32),
               shape=(A.nrows, B.ncols))
