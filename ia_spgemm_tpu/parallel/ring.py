"""Ring-overlapped distributed SpGEMM (the flagship multi-chip path).

The reference is a single process (SURVEY.md §2.7); the distributed
capability this framework adds is row-partitioned SpGEMM. The simple paths
(parallel/distributed.py) replicate or all_gather B, which materializes all
of B on every chip. This module streams B around a ring instead:

  - A and C are row-sharded ELL blocks (one per device).
  - B is row-sharded into D equal blocks; at step s device d holds the
    block owned by (d + s) % D.
  - Each step, the device gathers the product runs for its A entries whose
    column falls in the circulating block, while lax.ppermute sends the
    block to the left neighbor — XLA's async collective-permute lets the
    transfer ride ICI concurrently with the gather (the overlap the
    BASELINE.md north star asks for). Peak per-chip B footprint is one
    block (2 in flight), not all of B.
  - After D steps every product run is filled; one row-local bitonic
    sort-compress (ops/bitonic.py) finishes the row block in VMEM.

Capacity is static: each A row has ka runs of `run` slots regardless of
which step supplies them, so the product buffer is allocated once and
steps only select into it (no dynamic shapes anywhere).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ia_spgemm_tpu.formats.types import ELL
from ia_spgemm_tpu.ops import bitonic


@struct.dataclass
class ShardedELL:
    """Row-block-sharded ELL: leading dim = shard.

    row_map holds the GLOBAL row id of each (shard, local) slot (-1 =
    padding) so balanced partitionings can permute rows; contiguous blocks
    use the identity map."""

    col_ind: jax.Array   # (D, m_loc, K) int32, -1 empty
    values: jax.Array    # (D, m_loc, K)
    nnz_row: jax.Array   # (D, m_loc) int32
    row_map: jax.Array   # (D, m_loc) int32 global row ids, -1 padding
    shape: Tuple[int, int] = struct.field(pytree_node=False)
    contiguous: bool = struct.field(pytree_node=False, default=True)

    @property
    def num_shards(self) -> int:
        return self.col_ind.shape[0]

    @property
    def rows_per_shard(self) -> int:
        return self.col_ind.shape[1]

    @property
    def width(self) -> int:
        return self.col_ind.shape[2]


def partition_rows_ell(A: ELL, num_shards: int,
                       mesh: Mesh | None = None,
                       balance: str = "rows",
                       B: ELL | None = None) -> ShardedELL:
    """Row blocks of ceil(m / D) rows.

    balance="rows": contiguous blocks (identity row_map, tail padded).
    balance="flops": rows dealt greedily by descending per-row product
    count onto the least-loaded shard — the flops-balance the reference's
    CV feature motivates (csr/common_csr.h:276) — recorded in row_map.
    """
    m, K = A.col_ind.shape
    m_loc = -(-m // num_shards)
    pad = num_shards * m_loc - m
    if balance == "rows":
        order = np.arange(m, dtype=np.int64)
    elif balance == "flops":
        lens_b = np.asarray((B or A).nnz_row).astype(np.int64)
        cols = np.asarray(A.col_ind)
        rf = np.where(cols >= 0,
                      lens_b[np.clip(cols, 0, lens_b.shape[0] - 1)],
                      0).sum(axis=1)
        by_cost = np.argsort(-rf, kind="stable")
        # greedy deal: heaviest row onto the least-loaded shard
        assign = np.full((num_shards, m_loc), -1, np.int64)
        slot = np.zeros(num_shards, np.int64)
        load = np.zeros(num_shards, np.float64)
        for r in by_cost:
            d = int(np.argmin(load))
            assign[d, slot[d]] = r
            slot[d] += 1
            load[d] += float(rf[r])
            if slot[d] == m_loc:
                load[d] = np.inf  # shard full
        order = assign.reshape(-1)
    else:
        raise ValueError(balance)

    if balance == "rows":
        col = np.pad(np.asarray(A.col_ind), ((0, pad), (0, 0)),
                     constant_values=-1)
        val = np.pad(np.asarray(A.values), ((0, pad), (0, 0)))
        nnz_row = np.pad(np.asarray(A.nnz_row), (0, pad))
        row_map = np.concatenate([np.arange(m, dtype=np.int64),
                                  np.full(pad, -1, np.int64)])
    else:
        sel = np.clip(order, 0, m - 1)
        valid = (order >= 0)[:, None]
        col = np.where(valid, np.asarray(A.col_ind)[sel], -1)
        val = np.where(valid, np.asarray(A.values)[sel], 0)
        nnz_row = np.where(order >= 0, np.asarray(A.nnz_row)[sel], 0)
        row_map = order
    out = ShardedELL(
        col_ind=jnp.asarray(col.reshape(num_shards, m_loc, K)),
        values=jnp.asarray(val.reshape(num_shards, m_loc, K)),
        nnz_row=jnp.asarray(nnz_row.reshape(num_shards, m_loc)
                            .astype(np.int32)),
        row_map=jnp.asarray(row_map.reshape(num_shards, m_loc)
                            .astype(np.int32)),
        shape=A.shape, contiguous=(balance == "rows"))
    if mesh is not None:
        axis = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(axis))
        out = jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), out)
    return out


def plan_ring(A: ELL, B: ELL, num_shards: int,
              allow_split: bool = True) -> bitonic.BitonicPlan:
    m_loc = -(-A.nrows // num_shards)
    return bitonic.plan_bitonic_dims(m_loc, A.max_nnz_per_row,
                                     B.max_nnz_per_row,
                                     allow_split=allow_split)


def ring_spgemm(A: ShardedELL, B: ShardedELL, mesh: Mesh,
                plan: bitonic.BitonicPlan,
                interpret: bool | None = None,
                use_rdma="auto") -> ShardedELL:
    """C = A @ B, A and C row-sharded, B streamed around the ring.

    B may be partitioned with any balance: each chip builds the inverse
    row map (global B row -> owning shard, local slot) once from an
    all_gather of B.row_map, so membership tests against the circulating
    block are O(1) per entry (round 1 required contiguous B blocks).
    Sub-run splitting (plan.chunks > 1) is applied to the circulating
    block's packed table exactly as the single-chip expand does."""
    if not plan.viable:
        # a non-viable plan carries placeholder dims; driving it into
        # the Pallas kernel means a Mosaic compile blowup, not an error
        raise ValueError(
            f"ring plan not viable (width {plan.width}); split sub-runs "
            "further or fall back to the distributed ESC path")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, _ = A.shape
    n = B.shape[1]
    if use_rdma == "auto":
        from ia_spgemm_tpu.parallel.rdma_ring import rdma_available
        use_rdma = rdma_available(mesh)
    fn = _ring_fn(mesh, A.num_shards, A.rows_per_shard, B.rows_per_shard,
                  A.width, B.width, jnp.dtype(A.values.dtype),
                  plan.run, plan.width, plan.tile_rows, interpret,
                  plan.chunks, B.contiguous, bool(use_rdma))
    col, val, nnz_row = fn(A.col_ind, A.values, B.col_ind, B.values,
                           B.row_map)
    return ShardedELL(col_ind=col, values=val, nnz_row=nnz_row,
                      row_map=A.row_map, shape=(m, n),
                      contiguous=A.contiguous)


@functools.lru_cache(maxsize=64)
def _ring_fn(mesh: Mesh, D: int, m_loc: int, k_loc: int, ka: int, kb: int,
             dtype, run: int, width: int, tile_rows: int, interpret: bool,
             chunks: int = 1, b_contiguous: bool = True,
             use_rdma: bool = False):
    """Build + jit the sharded ring program once per (mesh, shapes) —
    rebuilding shard_map per call retraces and recompiles every time."""
    from jax import shard_map

    axis = mesh.axis_names[0]
    perm = [(i, (i - 1) % D) for i in range(D)]
    ke = ka * chunks          # expanded entry count per row
    kc = k_loc * chunks       # circulating table rows (fwd half)

    def local_fn(a_col, a_val, b_col, b_val, b_rmap):
        a_col, a_val = a_col[0], a_val[0]          # (m_loc, ka)
        b_col, b_val = b_col[0], b_val[0]          # (k_loc, kb)
        d = jax.lax.axis_index(axis)

        # --- per-entry (owner shard, local slot) of each A column ---
        if b_contiguous:
            valid_e = a_col >= 0
            owner_of = jnp.where(valid_e, a_col // k_loc, -1)
            local_of = jnp.clip(a_col - jnp.maximum(owner_of, 0) * k_loc,
                                0, k_loc - 1)
        else:
            # inverse of B's row permutation, built once per call from an
            # all_gather of the (D, k_loc) row map (tiny)
            g_rmap = jax.lax.all_gather(b_rmap[0], axis)   # (D, k_loc)
            k_total = D * k_loc
            ids = jnp.clip(g_rmap.reshape(-1), -1, k_total - 1)
            sh = jax.lax.broadcasted_iota(
                jnp.int32, (D, k_loc), 0).reshape(-1)
            sl = jax.lax.broadcasted_iota(
                jnp.int32, (D, k_loc), 1).reshape(-1)
            owner_tab = jnp.full((k_total + 1,), -1, jnp.int32)
            local_tab = jnp.zeros((k_total + 1,), jnp.int32)
            safe = jnp.where(ids >= 0, ids, k_total)
            owner_tab = owner_tab.at[safe].set(sh, mode="drop")
            local_tab = local_tab.at[safe].set(sl, mode="drop")
            a_safe = jnp.where(a_col >= 0,
                               jnp.clip(a_col, 0, k_total - 1), k_total)
            owner_of = owner_tab[a_safe]
            local_of = local_tab[a_safe]

        # --- sub-run chunk expansion of the A entries ---
        if chunks > 1:
            sub = jax.lax.broadcasted_iota(jnp.int32, (1, ka, chunks), 2)
            owner_of = jnp.broadcast_to(
                owner_of[:, :, None], (m_loc, ka, chunks)).reshape(m_loc,
                                                                   ke)
            local_of = (local_of[:, :, None] * chunks + sub).reshape(
                m_loc, ke)
            a_val_e = jnp.broadcast_to(
                a_val[:, :, None], (m_loc, ka, chunks)).reshape(m_loc, ke)
        else:
            a_val_e = a_val

        key0 = jnp.full((m_loc, ke, run), bitonic.SENTINEL, jnp.int32)
        val0 = jnp.zeros((m_loc, ke, run), a_val.dtype)

        def step(s, carry):
            bc, bv, key, val = carry
            owner = jax.lax.rem(d + s, jnp.int32(D))
            in_blk = owner_of == owner
            # doubled packed table: forward + reversed rows (odd A entries
            # read the reversed half -> alternating-direction runs)
            bc_p = jnp.pad(bc, ((0, 0), (0, chunks * run - kb)),
                           constant_values=-1).reshape(kc, run)
            bv_p = jnp.pad(bv, ((0, 0), (0, chunks * run - kb))
                           ).reshape(kc, run)
            parity = (jax.lax.broadcasted_iota(jnp.int32, (1, ke), 1) & 1)
            rows = (local_of + kc * parity).reshape(-1)
            gc, gv = bitonic.doubled_table_gather(
                bc_p, bv_p, rows, run=run, out_shape=(m_loc, ke, run))
            sel = in_blk[:, :, None] & (gc >= 0)
            key = jnp.where(in_blk[:, :, None],
                            jnp.where(sel, gc, bitonic.SENTINEL), key)
            val = jnp.where(sel, a_val_e[:, :, None] * gv, val)
            # send the block on while the gather above computes: either
            # XLA's async collective-permute or the explicit Pallas RDMA
            # hop (parallel/rdma_ring.py; real multi-chip ICI only)
            if use_rdma:
                from ia_spgemm_tpu.parallel.rdma_ring import ring_hop_rdma
                bc = ring_hop_rdma(bc, axis=axis, D=D, collective_id=11)
                bv = ring_hop_rdma(bv, axis=axis, D=D, collective_id=12)
            else:
                bc = jax.lax.ppermute(bc, axis, perm)
                bv = jax.lax.ppermute(bv, axis, perm)
            return bc, bv, key, val

        _, _, key, val = jax.lax.fori_loop(
            0, D, step, (b_col, b_val, key0, val0))

        key = key.reshape(m_loc, ke * run)
        val = val.reshape(m_loc, ke * run)
        pad = width - ke * run
        if pad:
            key = jnp.pad(key, ((0, 0), (0, pad)),
                          constant_values=bitonic.SENTINEL)
            val = jnp.pad(val, ((0, 0), (0, pad)))
        col, out_val, nnz_row = bitonic._sort_compress_rows(
            key, val, width=width, start_kk=2 * run,
            tile_rows=tile_rows, interpret=interpret,
            static_strides=width <= bitonic.STATIC_STRIDE_MAX_WIDTH)
        return col[None], out_val[None], nnz_row[:, 0][None]

    return jax.jit(shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 5,
        out_specs=(P(axis),) * 3,
        check_vma=False))


def gather_result_ell(C: ShardedELL) -> ELL:
    """Host-side: fuse the row-sharded result into one global ELL,
    inverting the partition's row permutation."""
    m, n = C.shape
    w = C.width
    col = np.asarray(C.col_ind).reshape(-1, w)
    val = np.asarray(C.values).reshape(-1, w)
    nnz_row = np.asarray(C.nnz_row).reshape(-1)
    rmap = np.asarray(C.row_map).reshape(-1)
    sel = rmap >= 0
    out_col = np.full((m, w), -1, np.int32)
    out_val = np.zeros((m, w), val.dtype)
    out_nnz = np.zeros(m, np.int32)
    out_col[rmap[sel]] = col[sel]
    out_val[rmap[sel]] = val[sel]
    out_nnz[rmap[sel]] = nnz_row[sel]
    return ELL(col_ind=jnp.asarray(out_col), values=jnp.asarray(out_val),
               nnz_row=jnp.asarray(out_nnz),
               nnz=jnp.asarray(np.int32(out_nnz.sum())), shape=(m, n))
