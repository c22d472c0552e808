"""Reference (oracle) SpMM implementations — numpy, float64 accumulation.

These define the semantics every optimized kernel is verified against,
playing the role of the reference's sequential CPU kernels (kernel number 0
in the engine, reference/src/engine/engine.cpp:30-32):

- CSR row-gather loop      ≙ spmmCSRCpu  (reference/src/spmm/csr/spmm_csr.cpp:6-30)
- COO streaming accumulate ≙ spmmCOOCpu  (reference/src/spmm/coo/spmm_coo.cpp:6-27)
- BSR block expansion      ≙ spmmBSRCpu  (reference/src/spmm/bsr/spmm_bsr.cpp:7-42)
- ELL column-slot scatter  ≙ spmmELLCpu  (reference/src/spmm/ell/spmm_ell.cpp:6-31)

All accumulate in float64, as the reference instantiates its CPU kernels with
AccT=double (reference/src/main.cu:185), and return float32.
"""

from __future__ import annotations

import numpy as np

from tpuspmm.formats import CSR, COO, BSR, ELL


def spmm_csr_oracle(a: CSR, b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, dtype=np.float64)
    out = np.zeros((a.shape[0], b.shape[1]), dtype=np.float64)
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    values = np.asarray(a.values, dtype=np.float64)
    for r in range(a.shape[0]):
        s, e = indptr[r], indptr[r + 1]
        if e > s:
            out[r] = values[s:e] @ b[indices[s:e]]
    return out.astype(np.float32)


def _accumulate_triplets_f64(rows, cols, vals, num_rows: int,
                             b: np.ndarray) -> np.ndarray:
    """Row-sorted, slab-bounded f64 triplet accumulation (duplicates
    accumulate).  The naive ``vals[:, None] * b[cols]`` materializes an
    (nnz, n) f64 intermediate — 22 GB of HOST RAM for large_20000 at its
    on-disk width 20000 — and ``np.add.at`` element-loops over it
    (observed: the oracle alone ran >29 min and thrashed).  Slabs cap
    the intermediate at ~64 MB and ``np.add.reduceat`` does the per-row
    segment sums at C speed; only the (few) distinct rows per slab go
    through ``np.add.at``."""
    out = np.zeros((num_rows, b.shape[1]), dtype=np.float64)
    if len(rows) == 0:
        return out
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    step = max(1, (64 << 20) // max(int(b.shape[1]) * 8, 1))
    for s in range(0, len(rows), step):
        r = rows[s:s + step]
        contrib = vals[s:s + step, None] * b[cols[s:s + step]]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(r)) + 1])
        sums = np.add.reduceat(contrib, starts, axis=0)
        # a row can span a slab boundary — add, don't assign
        np.add.at(out, r[starts], sums)
    return out


def spmm_coo_oracle(a: COO, b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, dtype=np.float64)
    out = _accumulate_triplets_f64(
        np.asarray(a.rows), np.asarray(a.cols),
        np.asarray(a.values, dtype=np.float64), a.shape[0], b)
    return out.astype(np.float32)


def spmm_bsr_oracle(a: BSR, b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, dtype=np.float64)
    bh, bw = a.block_size
    out = np.zeros((a.shape[0], b.shape[1]), dtype=np.float64)
    indptr = np.asarray(a.indptr)
    indices = np.asarray(a.indices)
    blocks = np.asarray(a.blocks, dtype=np.float64)
    for br in range(a.num_block_rows):
        s, e = indptr[br], indptr[br + 1]
        for bi in range(s, e):
            bc = indices[bi]
            out[br * bh : (br + 1) * bh] += blocks[bi] @ b[bc * bw : (bc + 1) * bw]
    return out.astype(np.float32)


def spmm_ell_oracle(a: ELL, b: np.ndarray) -> np.ndarray:
    """Column-slot scatter (≙ spmmELLCpu) via the shared slab-bounded
    triplet accumulator: slots flatten to (row, col, val) triplets with
    -1-sentinel slots dropped; duplicate coordinates accumulate."""
    b = np.asarray(b, dtype=np.float64)
    rowind = np.asarray(a.rowind)
    values = np.asarray(a.values, dtype=np.float64)
    if rowind.size == 0:
        return np.zeros((a.shape[0], b.shape[1]), dtype=np.float32)
    ncols, mcn = rowind.shape
    cols = np.repeat(np.arange(ncols), mcn)
    rows = rowind.reshape(-1)
    vals = values.reshape(-1)
    mask = rows >= 0
    out = _accumulate_triplets_f64(rows[mask], cols[mask], vals[mask],
                                   a.shape[0], b)
    return out.astype(np.float32)


def spmm_oracle(a, b: np.ndarray) -> np.ndarray:
    """Dispatch on container type."""
    if isinstance(a, CSR):
        return spmm_csr_oracle(a, b)
    if isinstance(a, COO):
        return spmm_coo_oracle(a, b)
    if isinstance(a, BSR):
        return spmm_bsr_oracle(a, b)
    if isinstance(a, ELL):
        return spmm_ell_oracle(a, b)
    if hasattr(a, "to_csr"):  # CSC and future formats
        return spmm_csr_oracle(a.to_csr(), b)
    raise TypeError(f"unsupported container {type(a)}")


def spmm_scipy_oracle(a, b: np.ndarray) -> np.ndarray:
    """Independent scipy oracle — the external validator's computation
    (reference/utils/python_utils/validate.py:18-20)."""
    return (a.to_scipy().astype(np.float64) @ np.asarray(b, dtype=np.float64)).astype(np.float32)
