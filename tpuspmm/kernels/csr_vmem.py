"""Pallas staged-B SpMM: whole dense operand resident in VMEM.

TPU-native counterpart of the reference's shared-memory staged kernel
`spmmCSRK4` (reference/src/spmm/csr/spmm_csr_k4.cu:12-79), which stages A
rows and whole B columns in CUDA shared memory and tree-reduces with warp
shuffles.  Here the *entire padded B* is pinned in VMEM (the 16-128 MiB TPU
analogue of the 48 KiB smem budget), the grid walks row tiles, and each row
tile's nnz chunks are densified and matmul'd against dynamically-sliced B
panels — zero HBM re-reads of B per row tile.

Like the reference kernel, admission is gated by a fit heuristic
(spmm_csr_k4.cu:91-101): `fits_vmem` must hold or the caller falls back to
the streaming tile kernel.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuspmm.kernels.common import (
    round_up, should_interpret, pad_b, split_bf16, onehot_dot_split)
from tpuspmm.formats.tiles import TilePlan, plan_from_container


def fits_vmem(
    k_pad: int, n_pad: int, tile_m: int,
    budget_bytes: int = 8 * 1024 * 1024, chunk_bytes: int = 0,
) -> bool:
    b_bytes = k_pad * n_pad * 4
    out_bytes = tile_m * n_pad * 4
    return (b_bytes + 2 * out_bytes + chunk_bytes) <= budget_bytes


def _kernel(kt_ref, start_ref, end_ref, rows_ref, cols_ref, vals_ref, b_ref,
            out_ref, *, tm, tk, chunk, mode):
    rt = pl.program_id(0)
    n = out_ref.shape[1]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, chunk), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, tk), 1)

    def body(j, acc):
        rows = rows_ref[j, :]
        cols = cols_ref[j, :]
        vals = vals_ref[j, :]
        b_panel = b_ref[pl.ds(kt_ref[j] * tk, tk), :]
        if mode in ("split", "split2"):
            # gather-then-scatter with exact bf16 one-hots and multi-term
            # bf16 split data (see cres_spmm._kernel): 6 (split) or 4
            # (split2) single-pass MXU matmuls per chunk vs 12 HIGHEST;
            # bf16-ingested B needs no split at all (one-pass gather)
            terms = 2 if mode == "split2" else 3
            b_parts = ([b_panel] if b_panel.dtype == jnp.bfloat16
                       else split_bf16(b_panel, terms))
            k_onehot = (cols[:, None] == k_iota).astype(jnp.bfloat16)
            g = onehot_dot_split(k_onehot, b_parts)
            v = g * vals[:, None]
            r_onehot = (rows[None, :] == r_iota).astype(jnp.bfloat16)
            return acc + onehot_dot_split(r_onehot, split_bf16(v, terms))
        r_onehot = (rows[None, :] == r_iota).astype(jnp.float32)
        k_onehot = (cols[:, None] == k_iota).astype(jnp.float32) * vals[:, None]
        a_tile = jnp.dot(r_onehot, k_onehot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
        return acc + jnp.dot(a_tile, b_panel.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    acc = jnp.zeros((tm, n), dtype=jnp.float32)
    out_ref[...] = jax.lax.fori_loop(start_ref[rt], end_ref[rt], body, acc)


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tk", "chunk", "num_row_tiles", "interpret", "mode"),
)
def _staged_spmm(kt, start, end, rows, cols, vals, b_padded, *, tm, tk, chunk,
                 num_row_tiles, interpret, mode="split"):
    n_pad = b_padded.shape[1]
    num_chunks = rows.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # kt, start, end
        grid=(num_row_tiles,),
        in_specs=[
            pl.BlockSpec((num_chunks, chunk), lambda r, *_: (0, 0)),
            pl.BlockSpec((num_chunks, chunk), lambda r, *_: (0, 0)),
            pl.BlockSpec((num_chunks, chunk), lambda r, *_: (0, 0)),
            pl.BlockSpec(b_padded.shape, lambda r, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, n_pad), lambda r, *_: (r, 0)),
    )

    return pl.pallas_call(
        functools.partial(_kernel, tm=tm, tk=tk, chunk=chunk, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_row_tiles * tm, n_pad), jnp.float32),
        interpret=interpret,
    )(kt, start, end, rows, cols, vals, b_padded)


def spmm_staged(a_or_plan, b, interpret=None, budget_bytes: int = 8 * 1024 * 1024,
                mode: str = "split"):
    plan = a_or_plan if isinstance(a_or_plan, TilePlan) else plan_from_container(a_or_plan)
    m, k = plan.shape
    n = b.shape[1]
    n_pad = round_up(n, 128)
    k_pad = plan.num_k_tiles * plan.tile_k
    chunk_bytes = plan.num_chunks * plan.chunk * 12
    if not fits_vmem(k_pad, n_pad, plan.tile_m, budget_bytes, chunk_bytes):
        raise ValueError(
            f"B ({k_pad}x{n_pad}) + chunks exceed the VMEM stage budget; "
            "use spmm_tiles")
    b_padded = pad_b(jnp.asarray(b), k_pad, n_pad)
    start, end = plan.chunk_ranges()
    out = _staged_spmm(
        jnp.asarray(plan.kt), jnp.asarray(start), jnp.asarray(end),
        jnp.asarray(plan.rows), jnp.asarray(plan.cols), jnp.asarray(plan.vals),
        b_padded,
        tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
        num_row_tiles=plan.num_row_tiles, interpret=should_interpret(interpret),
        mode=mode,
    )
    return out[:m, :n]
