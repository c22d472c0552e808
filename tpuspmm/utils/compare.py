"""Correctness gate.

Counterpart of the reference's torch::allclose bridge
(reference/include/cuda_utils.hpp:27-41 `toTorch` +
e.g. reference/src/spmm/csr/spmm_csr_k1.cu:76-78), with the same default
tolerances (REL_TOL=1e-2, ABS_TOL=1e-3, reference/include/utils.hpp:10-11).
torch's allclose semantics: |a - b| <= atol + rtol * |b|.
"""

from __future__ import annotations

import numpy as np


def allclose(result, reference, rel_tol: float = 1e-2, abs_tol: float = 1e-3) -> bool:
    result = np.asarray(result, dtype=np.float64)
    reference = np.asarray(reference, dtype=np.float64)
    if result.shape != reference.shape:
        return False
    return bool(np.allclose(result, reference, rtol=rel_tol, atol=abs_tol))


def max_abs_err(result, reference) -> float:
    return float(np.max(np.abs(np.asarray(result, np.float64) - np.asarray(reference, np.float64))))
