"""Pallas C-resident SpMM: whole output pinned in VMEM, k-major streaming.

The third point in the design space of VMEM residency (SURVEY.md §2.4 has
no CUDA analogue — shared memory is far too small to hold C):

- tile_spmm   — streams both B panels and C tiles (general case);
- csr_vmem    — whole *B* resident in VMEM, good when K·N is small;
- this kernel — whole *C* resident in VMEM, good when K is huge but M·N
  fits (the large_25605 shape: K=25605 → B is 26 MB, but C is 6.5 MB).

Chunks are sorted k-major, so each (tile_k × N) B panel is DMA'd exactly
once — B HBM traffic drops from (chunks × panel) to (num_k_tiles × panel).
Each grid step densifies its chunk via the one-hot MXU trick (see
tile_spmm.py) and accumulates into the resident C at a dynamic row offset;
the buffer flushes to HBM once, after the last step.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuspmm.kernels.common import round_up, should_interpret, pad_b
from tpuspmm.formats.tiles import TilePlan, plan_from_container


def fits_vmem_out(m_pad: int, n_pad: int, tile_k: int,
                  budget_bytes: int = 8 * 1024 * 1024) -> bool:
    out_bytes = m_pad * n_pad * 4
    panel_bytes = 2 * tile_k * n_pad * 4  # double-buffered B panel
    return out_bytes + panel_bytes <= budget_bytes


def _kernel(rt_ref, kt_ref, rows_ref, cols_ref, vals_ref, b_ref, out_ref, *, tm, tk):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    sub = c % 8
    rows = rows_ref[sub, :]
    cols = cols_ref[sub, :]
    vals = vals_ref[sub, :]
    e = rows.shape[0]

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, e), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (e, tk), 1)
    r_onehot = (rows[None, :] == r_iota).astype(jnp.float32)
    k_onehot = (cols[:, None] == k_iota).astype(jnp.float32) * vals[:, None]
    a_tile = jnp.dot(r_onehot, k_onehot, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    contrib = jnp.dot(a_tile, b_ref[...], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    off = rt_ref[c] * tm
    out_ref[pl.ds(off, tm), :] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tk", "chunk", "num_row_tiles", "num_k_tiles", "interpret"),
)
def _cres_spmm(rt, kt, rows, cols, vals, b_padded,
               *, tm, tk, chunk, num_row_tiles, num_k_tiles, interpret):
    num_chunks = rt.shape[0]
    n_pad = b_padded.shape[1]
    m_pad = num_row_tiles * tm

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rt, kt
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda c, rt_ref, kt_ref: (c // 8, 0)),
            pl.BlockSpec((8, chunk), lambda c, rt_ref, kt_ref: (c // 8, 0)),
            pl.BlockSpec((8, chunk), lambda c, rt_ref, kt_ref: (c // 8, 0)),
            # k-major chunk order → consecutive chunks share this index,
            # so each panel is fetched exactly once
            pl.BlockSpec((tk, n_pad), lambda c, rt_ref, kt_ref: (kt_ref[c], 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, n_pad), lambda c, rt_ref, kt_ref: (0, 0)),
    )

    flops = 2 * num_chunks * (tm * chunk * tk + tm * tk * n_pad)
    bytes_accessed = (num_chunks * chunk * 12
                      + num_k_tiles * tk * n_pad * 4 + m_pad * n_pad * 4)

    return pl.pallas_call(
        functools.partial(_kernel, tm=tm, tk=tk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(rt, kt, rows, cols, vals, b_padded)


def _kmajor_arrays(plan: TilePlan):
    """Chunk payloads re-sorted k-major (cached device arrays)."""
    cached = getattr(plan, "_kmajor_arrays", None)
    if cached is not None:
        return cached
    order = np.lexsort((plan.rt, plan.kt))
    arrs = (plan.rt[order], plan.kt[order], plan.rows[order],
            plan.cols[order], plan.vals[order])
    cached = tuple(jnp.asarray(x) for x in arrs)
    object.__setattr__(plan, "_kmajor_arrays", cached)
    return cached


def spmm_cres(a_or_plan, b, interpret=None, budget_bytes: int = 8 * 1024 * 1024):
    """Container/plan-level entry for the C-resident kernel."""
    plan = a_or_plan if isinstance(a_or_plan, TilePlan) else plan_from_container(a_or_plan)
    m, k = plan.shape
    n = b.shape[1]
    n_pad = round_up(n, 128)
    k_pad = plan.num_k_tiles * plan.tile_k
    m_pad = plan.num_row_tiles * plan.tile_m
    assert fits_vmem_out(m_pad, n_pad, plan.tile_k, budget_bytes), (
        f"output ({m_pad}x{n_pad}) exceeds the VMEM residency budget; use spmm_tiles"
    )
    b_padded = pad_b(jnp.asarray(b), k_pad, n_pad)
    rt, kt, rows, cols, vals = _kmajor_arrays(plan)
    out = _cres_spmm(
        rt, kt, rows, cols, vals, b_padded,
        tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
        num_row_tiles=plan.num_row_tiles, num_k_tiles=plan.num_k_tiles,
        interpret=should_interpret(interpret),
    )
    return out[:m, :n]
