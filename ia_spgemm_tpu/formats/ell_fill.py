"""Fast CSR->ELL fill for TPU.

The reference's CSRtoELL packs rows left-justified with a serial loop
(ell/common_ell.h:30-77). Two device strategies:

- scatter (formats/convert.py _csr_to_ell_fill): one scatter per nnz —
  ~9 ns/element on v5e, measured ~40 ms at 557k nnz. Kept for fp64/CPU.
- gather (here): out[r, j] = entries[rp[r] + j], masked at j >= len(r) —
  one packed (col | value-bits) gather at (m*K) positions. Gathers beat
  scatters ~4x on v5e, and packing halves them.

A per-row DMA kernel was tried first and is the long-term plan, but
Mosaic requires 1-D HBM DMA slices aligned to 1024 elements — arbitrary
rp[r] offsets need an aligned-window + per-row rotate pipeline; until
that lands the gather form is the TPU path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("width", "nrows"))
def ell_fill_gather(row_ptr, col_ind, values, *, width: int, nrows: int):
    """(row_ptr, col, val) CSR arrays -> (m, K) ELL col/val tables.

    col_ind/values must already be padded by >= width entries past nnz.
    """
    nnz_row = (row_ptr[1:] - row_ptr[:-1]).astype(jnp.int32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (nrows, width), 1)
    pos = row_ptr[:-1, None] + slot                       # (m, K)
    pos = jnp.clip(pos, 0, col_ind.shape[0] - 1).reshape(-1)
    valid = slot < nnz_row[:, None]
    if values.dtype == jnp.float32:
        packed = jnp.stack(
            [col_ind, jax.lax.bitcast_convert_type(values, jnp.int32)],
            axis=1)                                       # (N, 2)
        g = packed[pos]
        col = g[:, 0].reshape(nrows, width)
        val = jax.lax.bitcast_convert_type(g[:, 1], jnp.float32
                                           ).reshape(nrows, width)
    else:
        col = col_ind[pos].reshape(nrows, width)
        val = values[pos].reshape(nrows, width)
    col = jnp.where(valid, col, -1)
    val = jnp.where(valid, val, jnp.zeros_like(val))
    return col, val, nnz_row
