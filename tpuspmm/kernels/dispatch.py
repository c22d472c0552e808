"""Best-kernel dispatch for the Pallas path.

Chooses among the optimized kernels by format and problem geometry — the
runtime analogue of the reference's compile-time kernel numbering
(reference/include/engine/engine_csr.hpp:68-89).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpuspmm.formats import CSR, COO, BSR, ELL
from tpuspmm.kernels import tile_spmm, bsr_spmm, csr_vmem
from tpuspmm.kernels.common import round_up


def spmm_pallas(a, b, interpret=None):
    b = jnp.asarray(b)
    if isinstance(a, BSR) and bsr_spmm.mxu_friendly(a.block_size):
        return bsr_spmm.spmm_bsr_stream(a, b, interpret=interpret)
    if isinstance(a, BSR):
        packed = bsr_spmm.pack_blocks(a)
        if packed is not None:
            return bsr_spmm.spmm_bsr_stream(packed, b, interpret=interpret)
    # generic unstructured path
    plan = tile_spmm.plan_from_container(a)
    n_pad = round_up(b.shape[1], 128)
    k_pad = plan.num_k_tiles * plan.tile_k
    chunk_bytes = plan.num_chunks * plan.chunk * 12
    if csr_vmem.fits_vmem(k_pad, n_pad, plan.tile_m, chunk_bytes=chunk_bytes):
        return csr_vmem.spmm_staged(plan, b, interpret=interpret)
    return tile_spmm.spmm_tiles(plan, b, interpret=interpret)
