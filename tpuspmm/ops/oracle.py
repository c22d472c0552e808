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


def spmm_coo_oracle(a: COO, b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, dtype=np.float64)
    out = np.zeros((a.shape[0], b.shape[1]), dtype=np.float64)
    contrib = np.asarray(a.values, dtype=np.float64)[:, None] * b[np.asarray(a.cols)]
    np.add.at(out, np.asarray(a.rows), contrib)
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
    b = np.asarray(b, dtype=np.float64)
    out = np.zeros((a.shape[0], b.shape[1]), dtype=np.float64)
    rowind = np.asarray(a.rowind)
    values = np.asarray(a.values, dtype=np.float64)
    ncols, mcn = rowind.shape if rowind.size else (a.shape[1], 0)
    for k in range(mcn):
        rows = rowind[:, k]
        mask = rows >= 0
        contrib = values[mask, k][:, None] * b[np.arange(ncols)[mask]]
        np.add.at(out, rows[mask], contrib)
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
