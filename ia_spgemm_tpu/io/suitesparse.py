"""SuiteSparse-style matrix sourcing.

The reference's workloads are UF/SuiteSparse matrices shipped in Inputs/
(9 tiny fixtures; README.md:10 "all tests default calculate the square of
A"). This module provides:
- a local-collection loader (directory of .mtx files; this environment has
  no network egress, so remote fetch is stubbed with a clear error),
- deterministic synthetic generators spanning the structure classes the
  MatNet features discriminate (banded, random-uniform, power-law rows,
  block-diagonal) for bench/training when no collection is mounted.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Tuple

import numpy as np
import scipy.sparse as sp

REFERENCE_INPUTS = "/root/reference/IA-SPGEMM-CPU_release/Inputs"


def local_collection(path: str = REFERENCE_INPUTS) -> Dict[str, str]:
    """name -> .mtx path for every matrix in a local directory."""
    if not os.path.isdir(path):
        return {}
    return {os.path.splitext(f)[0]: os.path.join(path, f)
            for f in sorted(os.listdir(path)) if f.endswith(".mtx")}


def fetch(name: str, collection_dir: str = REFERENCE_INPUTS):
    """Load a matrix by name from a local collection as CSR."""
    from ia_spgemm_tpu.io.mmio import read_mtx_to_csr
    coll = local_collection(collection_dir)
    if name not in coll:
        raise FileNotFoundError(
            f"{name!r} not in local collection {collection_dir} "
            "(no network egress in this environment; mount or generate)")
    return read_mtx_to_csr(coll[name])


# ---------------------------------------------------------------------------
# synthetic generators (deterministic)
# ---------------------------------------------------------------------------

def gen_banded(m: int, bandwidth: int = 3, seed: int = 0) -> sp.csr_matrix:
    rng = np.random.default_rng(seed)
    diags = [rng.standard_normal(m) for _ in range(2 * bandwidth + 1)]
    return sp.diags(diags, list(range(-bandwidth, bandwidth + 1)),
                    shape=(m, m)).tocsr()


def gen_uniform(m: int, n: int | None = None, nnz_per_row: int = 8,
                seed: int = 0) -> sp.csr_matrix:
    n = n or m
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(m), nnz_per_row)
    cols = rng.integers(0, n, m * nnz_per_row)
    vals = rng.standard_normal(m * nnz_per_row)
    out = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    out.sum_duplicates()
    return out


def gen_powerlaw(m: int, mean_nnz: int = 8, alpha: float = 1.5,
                 seed: int = 0) -> sp.csr_matrix:
    """Skewed row lengths — the workload class the reference's CV feature
    exists for (csr/common_csr.h:276)."""
    rng = np.random.default_rng(seed)
    raw = rng.pareto(alpha, m) + 1.0
    lens = np.minimum((raw * mean_nnz / raw.mean()).astype(np.int64), m)
    rows = np.repeat(np.arange(m), lens)
    cols = rng.integers(0, m, int(lens.sum()))
    vals = rng.standard_normal(int(lens.sum()))
    out = sp.coo_matrix((vals, (rows, cols)), shape=(m, m)).tocsr()
    out.sum_duplicates()
    return out


def gen_blockdiag(m: int, block: int = 32, seed: int = 0) -> sp.csr_matrix:
    # a remainder block keeps the result exactly (m, m) — m // block
    # blocks alone silently shrank non-multiples (gen_blockdiag(100)
    # returned 96x96)
    sizes = [block] * (m // block)
    if m % block:
        sizes.append(m % block)
    blocks = [sp.random(s, s, density=0.4,
                        random_state=np.random.RandomState(seed + i),
                        format="csr") for i, s in enumerate(sizes)]
    return sp.block_diag(blocks, format="csr").tocsr()


GENERATORS = {
    "banded": gen_banded,
    "uniform": gen_uniform,
    "powerlaw": gen_powerlaw,
    "blockdiag": gen_blockdiag,
}


def synthetic_suite(m: int = 256, seeds: Tuple[int, ...] = (0, 1, 2)
                    ) -> Iterator[Tuple[str, sp.csr_matrix]]:
    """A labeled stream of structurally diverse matrices."""
    for seed in seeds:
        yield f"banded_{m}_{seed}", gen_banded(m, bandwidth=2 + seed,
                                               seed=seed)
        yield f"uniform_{m}_{seed}", gen_uniform(m, nnz_per_row=6 + seed,
                                                 seed=seed)
        yield f"powerlaw_{m}_{seed}", gen_powerlaw(m, seed=seed)
        yield f"blockdiag_{m}_{seed}", gen_blockdiag(m, seed=seed)
