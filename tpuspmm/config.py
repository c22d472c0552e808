"""Global configuration for tpuspmm.

The CUDA reference hard-codes its knobs at compile time — tolerances at
`reference/include/utils.hpp:10-11`, kernel block sizes per kernel file
(e.g. `reference/src/spmm/csr/spmm_csr_k2.cu:5`,
`reference/src/spmm/csr/spmm_csr_k4.cu:7-8`), and the device pin at
`reference/src/main.cu:176`.  Here everything is a runtime dataclass so the
CLI, engine, tests, and benchmarks share one config object.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    # Correctness gate — mirrors reference REL_TOL/ABS_TOL
    # (reference/include/utils.hpp:10-11, used via torch::allclose in every
    # kernel wrapper, e.g. reference/src/spmm/csr/spmm_csr_k1.cu:76-81).
    rel_tol: float = 1e-2
    abs_tol: float = 1e-3

    # Tile geometry for the Pallas tile-sparse kernels.  TM/TK are the
    # (row-tile, k-tile) sizes of the densified A tiles; both must be
    # multiples of the TPU lane/sublane tiling (8, 128) for f32.
    tile_m: int = 128
    tile_k: int = 128
    # nnz processed per grid step in the streaming kernels (the TPU analogue
    # of the reference's per-warp nnz chunking, spmm_csr_k2.cu:46-53).
    chunk_nnz: int = 128
    # Cap on the output column tile (N dimension); the kernels derive the
    # actual tile from the operand width (see tile_spmm.spmm_tiles), capped
    # here so a (tile_k × tile_n) B panel stays a small fraction of VMEM.
    tile_n_cap: int = 512

    # Panel-kernel geometry (kernels/panel_spmm.py): strips per panel (P).
    # The panel LHS is (P·tm × tk); larger P cuts the grid-step count at
    # the cost of more padding strips in the stacked plan (large_25605:
    # P=16 → 555 panels/36 MB, P=32 → 354 panels/46 MB).  None (default)
    # auto-picks per matrix via the cost model in
    # panel_spmm.choose_panel_geometry with per-chip constants; set an
    # int to pin it.
    panel_strips: Optional[int] = None

    # VMEM budget for the residency kernels' admission heuristics (staged-B
    # and C-resident) — the TPU analogue of the reference K4 shared-memory
    # fit check (reference/src/spmm/csr/spmm_csr_k4.cu:91-101, MAXSIZE smem
    # budget :8).  v5e has ~16 MiB of VMEM per core; half is left for
    # pipeline double-buffering and scratch.
    vmem_budget_bytes: int = 8 * 1024 * 1024

    # Dtypes
    value_dtype: str = "float32"
    index_dtype: str = "int32"
    # Accumulate in f32 on MXU (reference accumulates float kernels in
    # double, reference/src/main.cu:185; on TPU f32 accumulation over MXU
    # passes the same rel 1e-2 / abs 1e-3 gate).
    accum_dtype: str = "float32"

    # MXU precision strategy for the Pallas kernels:
    #  - "split"   — gather-then-scatter with exact bf16 one-hot operands
    #    and 3-term bf16 decomposition of the dense data (~2^-26 relative
    #    error, at/below f32's own accumulation rounding; 3x fewer MXU
    #    passes than "highest" — the robust default)
    #  - "split2"  — 2-term decomposition (~2^-17 error): ~4.5x fewer
    #    passes, but can breach the abs-1e-3 gate when values are O(100)
    #    and outputs cancel — served via the verified autotune path
    #  - "highest" — densify-then-matmul at Precision.HIGHEST (6 bf16
    #    passes per matmul; the conservative reference-parity mode)
    precision_mode: str = "split"

    # Force Pallas interpret mode (set automatically on CPU backends).
    interpret: Optional[bool] = None

    def resolve_interpret(self) -> bool:
        if self.interpret is not None:
            return self.interpret
        import jax

        return jax.default_backend() not in ("tpu", "axon")


_default: Optional[Config] = None


def default_config() -> Config:
    global _default
    if _default is None:
        _default = Config()
        if os.environ.get("TPUSPMM_INTERPRET"):
            _default.interpret = os.environ["TPUSPMM_INTERPRET"] == "1"
    return _default
