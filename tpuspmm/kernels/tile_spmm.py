"""Flagship Pallas kernel: tile-sparse SpMM via MXU one-hot densification.

TPU-native re-expression of the reference's whole CUDA strategy family
(SURVEY.md §2.4 K1-K5, K7-K8).  Instead of thread/warp decompositions, the
sparse matrix is pre-chunked into fixed-size groups of E nonzeros per
(row-tile, k-tile) pair (tpuspmm/formats/tiles.py).  Each grid step:

1. densifies its chunk into the (TM × TK) A tile with two iota-compare
   one-hot operands multiplied on the MXU:
       R[r, e]  = (rows[e] == r)                 — (TM, E)
       Gv[e, k] = (cols[e] == k) * vals[e]       — (E, TK)
       A_tile   = R @ Gv                         — duplicates accumulate,
   which is the atomic-free answer to the reference's atomicAdd scatter
   (reference/src/spmm/coo/spmm_coo_k1.cu:24) — TPU grid steps execute
   sequentially per core, so revisiting accumulation replaces atomics;
2. multiplies A_tile against the (TK × TN) B panel streamed HBM→VMEM by
   the pipeline (B panel choice is data-dependent via scalar prefetch —
   the Pallas answer to the reference's `__ldg` row-pointer indirection,
   spmm_csr_k2.cu:10-58);
3. accumulates into the (TM × TN) output tile, which stays resident in
   VMEM across consecutive chunks of the same row tile.

nnz-balanced by construction: every grid step does identical static-shape
work, the merge-path goal of reference K2's warp rotation without any
divergence.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuspmm.kernels.common import (
    round_up, should_interpret, pad_b, split_bf16, onehot_dot_split)
from tpuspmm.formats.tiles import TilePlan, plan_from_container


def _kernel(rt_ref, kt_ref, first_ref, rows_ref, cols_ref, vals_ref, b_ref,
            out_ref, *, tm, tk, mode):
    c = pl.program_id(1)
    # chunk payloads arrive in (8, E) sublane-aligned blocks; this chunk is
    # row c % 8 of its block (see tiles.py C_pad)
    sub = c % 8
    rows = rows_ref[sub, :]  # (E,) int32, -1 padded
    cols = cols_ref[sub, :]
    vals = vals_ref[sub, :]
    e = rows.shape[0]

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, e), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (e, tk), 1)
    if mode in ("split", "split2"):
        # gather-then-scatter with exact bf16 one-hots and multi-term bf16
        # split data (see cres_spmm._kernel): 6 (split) or 4 (split2)
        # single-pass MXU matmuls per chunk vs 12 HIGHEST passes.
        terms = 2 if mode == "split2" else 3
        b_raw = b_ref[...]
        # bf16 ingestion: B already exact in bf16 → one-pass gather
        b_parts = ([b_raw] if b_raw.dtype == jnp.bfloat16
                   else split_bf16(b_raw, terms))
        k_onehot = (cols[:, None] == k_iota).astype(jnp.bfloat16)
        g = onehot_dot_split(k_onehot, b_parts)   # (E, TN): B rows
        v = g * vals[:, None]
        r_onehot = (rows[None, :] == r_iota).astype(jnp.bfloat16)
        contrib = onehot_dot_split(r_onehot, split_bf16(v, terms))
    else:
        r_onehot = (rows[None, :] == r_iota).astype(jnp.float32)  # (TM, E)
        k_onehot = (cols[:, None] == k_iota).astype(jnp.float32) * vals[:, None]  # (E, TK)
        a_tile = jnp.dot(r_onehot, k_onehot, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        contrib = jnp.dot(a_tile, b_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    @pl.when(first_ref[c] == 1)
    def _():
        out_ref[...] = contrib

    @pl.when(first_ref[c] != 1)
    def _():
        out_ref[...] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tk", "chunk", "num_row_tiles", "num_k_tiles",
                     "tile_n", "interpret", "mode"),
)
def _tile_spmm(
    rt, kt, first, rows, cols, vals, b_padded,
    *, tm, tk, chunk, num_row_tiles, num_k_tiles, tile_n, interpret,
    mode="split",
):
    num_chunks = rt.shape[0]
    n_pad = b_padded.shape[1]
    n_tiles = n_pad // tile_n

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # rt, kt, first
        grid=(n_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda n, c, rt_ref, kt_ref, first_ref: (c // 8, 0)),
            pl.BlockSpec((8, chunk), lambda n, c, rt_ref, kt_ref, first_ref: (c // 8, 0)),
            pl.BlockSpec((8, chunk), lambda n, c, rt_ref, kt_ref, first_ref: (c // 8, 0)),
            pl.BlockSpec(
                (tk, tile_n),
                lambda n, c, rt_ref, kt_ref, first_ref: (kt_ref[c], n),
            ),
        ],
        out_specs=pl.BlockSpec(
            (tm, tile_n),
            lambda n, c, rt_ref, kt_ref, first_ref: (rt_ref[c], n),
        ),
    )

    if mode in ("split", "split2"):
        t = 2 if mode == "split2" else 3
        flops = 2 * num_chunks * t * (chunk * tk * tile_n
                                      + tm * chunk * tile_n) * n_tiles
    else:
        flops = 2 * num_chunks * 6 * (tm * chunk * tk + tm * tk * tile_n) * n_tiles
    bytes_accessed = (
        num_chunks * chunk * 12
        + num_chunks * tk * tile_n * 4 * n_tiles
        + num_row_tiles * tm * n_pad * 4
    )

    return pl.pallas_call(
        functools.partial(_kernel, tm=tm, tk=tk, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_row_tiles * tm, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(rt, kt, first, rows, cols, vals, b_padded)


def spmm_tiles(plan: TilePlan, b, tile_n: Optional[int] = None, interpret=None,
               mode: str = "split"):
    """SpMM from a prebuilt TilePlan.  Returns the (M, N) float32 result."""
    m, k = plan.shape
    n = b.shape[1]
    interp = should_interpret(interpret)
    tile_n = tile_n or min(round_up(n, 128), 512)
    n_pad = round_up(n, tile_n)
    k_pad = plan.num_k_tiles * plan.tile_k
    b_padded = pad_b(b, k_pad, n_pad)

    rt, kt, first, rows, cols, vals = plan.device_arrays()
    out = _tile_spmm(
        rt, kt, first, rows, cols, vals,
        b_padded,
        tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
        num_row_tiles=plan.num_row_tiles, num_k_tiles=plan.num_k_tiles,
        tile_n=tile_n, interpret=interp, mode=mode,
    )
    return out[:m, :n]


def spmm_tile_sparse(a, b, tile_m=128, tile_k=128, chunk=128, tile_n=None,
                     interpret=None, mode: str = "split"):
    """Container-level entry: plan built (and cached on the container) + kernel."""
    plan = plan_from_container(a, tile_m=tile_m, tile_k=tile_k, chunk=chunk)
    return spmm_tiles(plan, jnp.asarray(b), tile_n=tile_n, interpret=interpret,
                      mode=mode)
