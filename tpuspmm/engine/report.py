"""Timing-record emission.

Schema parity with the reference's `reportTime`
(reference/include/utils.hpp:24-49), which prints one JSON object per run:
testcase / sparsity / format / kernelType / denseOrdering / correct /
cudaPrologTimeMs / cudaKernelTimeMs / cudaEpilogTimeMs / cudaTotalTimeMs /
sequentialTimeMs.  Here the "cuda" prefix becomes "tpu", the
sequential-time field actually carries the measured oracle time (the
reference prints a hard-coded 0, utils.hpp:48 — a known bug, SURVEY.md
§2.5), and roofline fields (GFLOP/s, nnz/s, %HBM speed-of-light) are added.
"""

from __future__ import annotations

import json
import sys
from typing import Optional

# HBM bandwidth per chip for roofline math (bytes/s).
HBM_GBPS = {
    "v5e": 819e9,   # TPU v5 lite
    "v5p": 2765e9,
    "v4": 1228e9,
    "cpu": 50e9,
}


def detect_chip(initialize: bool = True) -> str:
    """Chip family for roofline/threshold tables.

    ``initialize=False`` never forces JAX backend initialization: callers
    on host-only paths (plan building, admissibility checks) must not
    block on a remote/tunneled backend handshake just to pick cost
    constants.  Pre-initialization they get the ``TPUSPMM_CHIP`` env
    override or "cpu" (whose panel cost constants mirror v5e).
    """
    import os

    env = os.environ.get("TPUSPMM_CHIP", "")
    if env:
        return env
    import jax

    try:
        if not initialize:
            from jax._src import xla_bridge

            if not xla_bridge.backends_are_initialized():
                return "cpu"
        d = jax.devices()[0]
        kind = getattr(d, "device_kind", "") or ""
        if "v5 lite" in kind.lower() or "v5e" in kind.lower():
            return "v5e"
        if "v5p" in kind.lower() or "v5" in kind.lower():
            return "v5p"
        if "v4" in kind.lower():
            return "v4"
    except Exception:
        pass
    return "cpu"


def spmm_flops(nnz: int, n: int) -> int:
    """2 flops per nnz per output column (multiply-accumulate)."""
    return 2 * nnz * n


def spmm_min_bytes(nnz: int, m: int, k: int, n: int, index_bytes: int = 4) -> int:
    """Speed-of-light HBM traffic: read values+indices once, read B once,
    write C once (B re-reads are what good kernels avoid)."""
    return nnz * (4 + index_bytes) + k * n * 4 + m * n * 4


def make_record(
    *,
    testcase: str,
    sparsity: float,
    fmt: str,
    kernel_type,
    kernel_name: str = "",
    correct: Optional[bool] = None,
    prolog_ms: float = 0.0,
    kernel_ms: float = 0.0,
    epilog_ms: float = 0.0,
    sequential_ms: float = 0.0,
    nnz: int = 0,
    shape=(0, 0),
    n: int = 0,
    dense_ordering: str = "row_major",
    backend: str = "",
    extra: Optional[dict] = None,
) -> dict:
    total = prolog_ms + kernel_ms + epilog_ms
    rec = {
        "testcase": testcase,
        "sparsity": sparsity,
        "format": fmt,
        "kernelType": str(kernel_type),
        "kernelName": kernel_name,
        "denseOrdering": dense_ordering,
        "correct": ("1" if correct else "0") if correct is not None else "",
        "tpuPrologTimeMs": prolog_ms,
        "tpuKernelTimeMs": kernel_ms,
        "tpuEpilogTimeMs": epilog_ms,
        "tpuTotalTimeMs": total,
        "sequentialTimeMs": sequential_ms,
        "backend": backend,
        # operand provenance: records must self-describe the dense
        # operand they timed (a 0.5 ms record at width 12600 is not
        # comparable with a width-256 headline) — VERDICT r4 weak #5
        "bCols": int(n),
    }
    # derived throughput only when the measurement is above the chained
    # timer's noise floor: on the tunneled backend device_time_ms subtracts
    # a measured RTT, so a kernel cheaper than ~2 µs can net out to ~0 (or
    # sub-ns) and the derived GFLOP/s / roofline fields would be garbage
    # (seen on small_32x32 verify records: 3.2e6 "GFLOP/s")
    if kernel_ms > 2e-3 and nnz and n:
        secs = kernel_ms / 1e3
        chip = detect_chip()
        rec["gflops"] = spmm_flops(nnz, n) / secs / 1e9
        rec["nnzPerSec"] = nnz / secs
        sol_secs = spmm_min_bytes(nnz, shape[0], shape[1], n) / HBM_GBPS[chip]
        rec["hbmRooflineFraction"] = sol_secs / secs
        rec["chip"] = chip
    if extra:
        rec.update(extra)
    return rec


def emit(record: dict, stream=None) -> None:
    print(json.dumps(record), file=stream or sys.stdout, flush=True)
