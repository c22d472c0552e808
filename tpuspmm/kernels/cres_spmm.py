"""Pallas C-resident SpMM: whole output pinned in VMEM, k-major streaming.

The third point in the design space of VMEM residency (SURVEY.md §2.4 has
no CUDA analogue — shared memory is far too small to hold C):

- tile_spmm   — streams both B panels and C tiles (general case);
- csr_vmem    — whole *B* resident in VMEM, good when K·N is small;
- this kernel — whole *C* resident in VMEM, good when K is huge but M·N
  fits (the large_25605 shape: K=25605 → B is 26 MB, but C is 6.5 MB).

Chunks are sorted k-major and padded per k-tile group to multiples of 8 so
each grid step consumes one whole (8 × E) payload block against a single
B panel: the panel is DMA'd once per k-tile, the per-step machinery is
amortized over 8 chunks (grid steps ≈ num k-tile groups, not num chunks —
measured 0.47 ms vs 0.60 ms chunk-per-step on the headline matrix), and
the resident output accumulates at dynamic row offsets, flushing to HBM
once after the last step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuspmm.kernels.common import (
    round_up, should_interpret, pad_b, split_bf16, onehot_dot_split)
from tpuspmm.formats.tiles import TilePlan, plan_from_container


def fits_vmem_out(m_pad: int, n_pad: int, tile_k: int,
                  budget_bytes: int = 8 * 1024 * 1024) -> bool:
    out_bytes = m_pad * n_pad * 4
    panel_bytes = 2 * tile_k * n_pad * 4  # double-buffered B panel
    return out_bytes + panel_bytes <= budget_bytes


def fits_vmem_loop(m_pad: int, n_pad: int, tile_k: int, num_chunks: int,
                   chunk: int, budget_bytes: int = 13 * 1024 * 1024) -> bool:
    """Admission for the k-loop schedule: output + whole chunk payload +
    double-buffered panel all resident (VMEM is ~16 MiB on v5e; leave head
    room for Mosaic scratch)."""
    out_bytes = m_pad * n_pad * 4
    payload_bytes = num_chunks * chunk * 12
    panel_bytes = 2 * tile_k * n_pad * 4
    return out_bytes + payload_bytes + panel_bytes <= budget_bytes


def _kernel(rt_ref, kt8_ref, rows_ref, cols_ref, vals_ref, b_ref, out_ref,
            *, tm, tk, mode):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    if mode in ("split", "split2"):
        # Split-precision gather/scatter: reassociate
        #   C_tile += R · (diag(vals) · K) · B
        # as gather-then-scatter.  K (col one-hot) and R (row one-hot) are
        # exact in bf16, so every matmul is a single MXU pass (vs 6 for a
        # Precision.HIGHEST f32 matmul).  "split" carries B and the scaled
        # gathered rows as 3-term bf16 sums (6 passes/chunk, ~2^-26 error
        # — the robust default); "split2" uses 2-term sums (4 passes/chunk,
        # ~2^-17 — served via the verified autotune path only); both vs 18
        # passes/chunk for the two HIGHEST matmuls of "highest".
        terms = 2 if mode == "split2" else 3
        b_raw = b_ref[...]
        # bf16 ingestion (serving mode): B is already exact in bf16, so the
        # gather collapses to ONE MXU pass — the dtype-breadth fast path
        b_parts = ([b_raw] if b_raw.dtype == jnp.bfloat16
                   else split_bf16(b_raw, terms))
        e = rows_ref.shape[1]
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, e), 0)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (e, tk), 1)
        for sub in range(8):  # all 8 chunks of this block share the B panel
            rt = rt_ref[c * 8 + sub]

            # sentinel chunks (k-group padding to 8) carry rt = -1 and are
            # skipped wholesale — ~20% of the block slots on scattered
            # matrices (scalar-predicated, so the skip costs nothing)
            @pl.when(rt >= 0)
            def _(sub=sub, rt=rt):
                rows = rows_ref[sub, :]
                cols = cols_ref[sub, :]
                vals = vals_ref[sub, :]
                k_onehot = (cols[:, None] == k_iota).astype(jnp.bfloat16)
                g = onehot_dot_split(k_onehot, b_parts)  # (E, TN): B rows
                v = g * vals[:, None]                    # f32-exact scale
                r_onehot = (rows[None, :] == r_iota).astype(jnp.bfloat16)
                contrib = onehot_dot_split(r_onehot, split_bf16(v, terms))
                out_ref[pl.ds(rt * tm, tm), :] += contrib
        return

    b_tile = b_ref[...].astype(jnp.float32)
    for sub in range(8):  # all 8 chunks of this block share the B panel
        rt = rt_ref[c * 8 + sub]

        @pl.when(rt >= 0)  # sentinel padding chunks skipped (rt = -1)
        def _(sub=sub, rt=rt):
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
            contrib = jnp.dot(a_tile, b_tile, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            out_ref[pl.ds(rt * tm, tm), :] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tk", "chunk", "num_row_tiles", "nblocks",
                     "interpret", "mode"),
)
def _cres_spmm(rt8, kt8, rows, cols, vals, b_padded,
               *, tm, tk, chunk, num_row_tiles, nblocks, interpret,
               mode="split"):
    n_pad = b_padded.shape[1]
    m_pad = num_row_tiles * tm

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # rt8 (per chunk), kt8 (per block)
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((8, chunk), lambda c, rt_ref, kt_ref: (c, 0)),
            pl.BlockSpec((8, chunk), lambda c, rt_ref, kt_ref: (c, 0)),
            pl.BlockSpec((8, chunk), lambda c, rt_ref, kt_ref: (c, 0)),
            # one k-tile panel per block; k-major order → fetched once each
            pl.BlockSpec((tk, n_pad), lambda c, rt_ref, kt_ref: (kt_ref[c], 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, n_pad), lambda c, rt_ref, kt_ref: (0, 0)),
    )

    if mode in ("split", "split2"):  # `terms` single-pass matmuls per side
        t = 2 if mode == "split2" else 3
        flops = 2 * nblocks * 8 * t * (chunk * tk * n_pad
                                       + tm * chunk * n_pad)
    else:  # two HIGHEST (6-pass) matmuls per chunk
        flops = 2 * nblocks * 8 * 6 * (tm * chunk * tk + tm * tk * n_pad)
    bytes_accessed = (nblocks * 8 * chunk * 12
                      + nblocks * tk * n_pad * 4 + m_pad * n_pad * 4)

    return pl.pallas_call(
        functools.partial(_kernel, tm=tm, tk=tk, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(rt8, kt8, rows, cols, vals, b_padded)


def _kernel_kloop(start_ref, end_ref, rt_ref, rows_ref, cols_ref, vals_ref,
                  b_ref, out_ref, *, tm, tk, mode="split"):
    """k-loop schedule: grid step = one k-tile, fori_loop over exactly that
    tile's chunks (whole payload VMEM-resident).  Removes the pad-to-8
    sentinel chunks of the block schedule (~28% wasted slots on the
    headline matrix) and amortizes the panel split over all its chunks."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    terms = 2 if mode == "split2" else 3
    b_raw = b_ref[...]
    b_parts = ([b_raw] if b_raw.dtype == jnp.bfloat16
               else split_bf16(b_raw, terms))
    e = rows_ref.shape[1]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, e), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (e, tk), 1)

    def body(j, carry):
        rows = rows_ref[j, :]
        cols = cols_ref[j, :]
        vals = vals_ref[j, :]
        k_onehot = (cols[:, None] == k_iota).astype(jnp.bfloat16)
        g = onehot_dot_split(k_onehot, b_parts)  # (E, TN): B rows
        v = g * vals[:, None]
        r_onehot = (rows[None, :] == r_iota).astype(jnp.bfloat16)
        contrib = onehot_dot_split(r_onehot, split_bf16(v, terms))
        off = rt_ref[j] * tm
        out_ref[pl.ds(off, tm), :] += contrib
        return carry

    jax.lax.fori_loop(start_ref[k], end_ref[k], body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tk", "chunk", "num_row_tiles", "num_k_tiles",
                     "interpret", "mode"),
)
def _cres_kloop_spmm(start, end, rt, rows, cols, vals, b_padded,
                     *, tm, tk, chunk, num_row_tiles, num_k_tiles, interpret,
                     mode="split"):
    n_pad = b_padded.shape[1]
    m_pad = num_row_tiles * tm
    num_chunks = rows.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # start/end (per k-tile), rt (per chunk)
        grid=(num_k_tiles,),
        in_specs=[
            pl.BlockSpec((num_chunks, chunk), lambda k, *_: (0, 0)),
            pl.BlockSpec((num_chunks, chunk), lambda k, *_: (0, 0)),
            pl.BlockSpec((num_chunks, chunk), lambda k, *_: (0, 0)),
            pl.BlockSpec((tk, n_pad), lambda k, *_: (k, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, n_pad), lambda k, *_: (0, 0)),
    )

    terms = 2 if mode == "split2" else 3
    flops = 2 * num_chunks * terms * (chunk * tk * n_pad + tm * chunk * n_pad)
    bytes_accessed = (num_chunks * chunk * 12
                      + num_k_tiles * tk * n_pad * 4 + m_pad * n_pad * 4)

    return pl.pallas_call(
        functools.partial(_kernel_kloop, tm=tm, tk=tk, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(start, end, rt, rows, cols, vals, b_padded)


def _kmajor_loop(plan: TilePlan):
    """Chunk payloads sorted k-major with per-k-tile [start, end) chunk
    ranges — no sentinel padding (cached device arrays)."""
    cached = getattr(plan, "_kmajor_loop", None)
    if cached is not None:
        return cached
    C = max(plan.num_chunks, 1)
    order = np.lexsort((plan.rt, plan.kt))
    rt, kt = plan.rt[order], plan.kt[order]
    rows, cols, vals = plan.rows[order], plan.cols[order], plan.vals[order]
    nkt = plan.num_k_tiles
    bounds = np.searchsorted(kt, np.arange(nkt + 1)).astype(np.int32)
    cached = (
        jnp.asarray(bounds[:-1]),
        jnp.asarray(bounds[1:]),
        jnp.asarray(rt.astype(np.int32)),
        jnp.asarray(rows),
        jnp.asarray(cols),
        jnp.asarray(vals),
    )
    if any(isinstance(x, jax.core.Tracer) for x in cached):
        return cached  # converted under a trace — caching would leak
    object.__setattr__(plan, "_kmajor_loop", cached)
    return cached


def _kmajor_blocks(plan: TilePlan):
    """Chunk payloads re-sorted k-major and padded per k-tile group to
    multiples of 8 (cached device arrays + block count)."""
    cached = getattr(plan, "_kmajor_blocks", None)
    if cached is not None:
        return cached
    C = plan.num_chunks
    order = np.lexsort((plan.rt, plan.kt))
    rt, kt = plan.rt[order], plan.kt[order]
    rows, cols, vals = plan.rows[order], plan.cols[order], plan.vals[order]
    E = plan.chunk

    gb = np.flatnonzero(np.diff(kt)) + 1
    starts = np.concatenate([[0], gb]) if C else np.zeros(0, np.int64)
    ends = np.concatenate([gb, [C]]) if C else np.zeros(0, np.int64)

    o_rt, o_rows, o_cols, o_vals, kt8 = [], [], [], [], []
    for s, e in zip(starts, ends):
        n = int(e - s)
        pad = (-n) % 8
        o_rt.append(rt[s:e])
        o_rows.append(rows[s:e])
        o_cols.append(cols[s:e])
        o_vals.append(vals[s:e])
        if pad:  # sentinel chunks: rt = -1 → the kernel skips them wholesale
            o_rt.append(np.full(pad, -1, np.int32))
            o_rows.append(np.full((pad, E), -1, np.int32))
            o_cols.append(np.zeros((pad, E), np.int32))
            o_vals.append(np.zeros((pad, E), np.float32))
        kt8.extend([int(kt[s])] * ((n + pad) // 8))
    if not kt8:  # empty matrix: one all-sentinel block
        o_rt = [np.full(8, -1, np.int32)]
        o_rows = [np.full((8, E), -1, np.int32)]
        o_cols = [np.zeros((8, E), np.int32)]
        o_vals = [np.zeros((8, E), np.float32)]
        kt8 = [0]

    cached = (
        jnp.asarray(np.concatenate(o_rt)),
        jnp.asarray(np.asarray(kt8, np.int32)),
        jnp.asarray(np.concatenate(o_rows)),
        jnp.asarray(np.concatenate(o_cols)),
        jnp.asarray(np.concatenate(o_vals)),
        len(kt8),
    )
    if any(isinstance(x, jax.core.Tracer)
           for x in cached if not isinstance(x, int)):
        return cached  # converted under a trace — caching would leak
    object.__setattr__(plan, "_kmajor_blocks", cached)
    return cached


def spmm_cres(a_or_plan, b, interpret=None, budget_bytes: int = 8 * 1024 * 1024,
              mode: str = "split", schedule: str = "auto"):
    """Container/plan-level entry for the C-resident kernel.

    ``schedule``: "kloop" (grid over k-tiles, in-kernel loop over each
    tile's chunks — no sentinel padding; split-precision modes only, the
    whole payload must fit VMEM per fits_vmem_loop), "block8" (grid over
    8-chunk blocks — all modes), or "auto" (block8 — measured faster
    than kloop on v5e at every corpus shape, BENCHMARKS.md kernel-tuning
    notes; kloop is kept as an explicit opt-in for payload shapes where
    the pad-to-8 sentinel waste dominates).
    """
    plan = a_or_plan if isinstance(a_or_plan, TilePlan) else plan_from_container(a_or_plan)
    m, k = plan.shape
    n = b.shape[1]
    n_pad = round_up(n, 128)
    k_pad = plan.num_k_tiles * plan.tile_k
    m_pad = plan.num_row_tiles * plan.tile_m
    if not fits_vmem_out(m_pad, n_pad, plan.tile_k, budget_bytes):
        raise ValueError(
            f"output ({m_pad}x{n_pad}) exceeds the VMEM residency budget; "
            "use spmm_tiles")
    b_padded = pad_b(jnp.asarray(b), k_pad, n_pad)
    if schedule == "auto":
        schedule = "block8"
    if schedule == "kloop":
        if mode not in ("split", "split2"):
            # the kloop kernel only implements the bf16 split tiers —
            # treating "highest" as a 3-term split would be a silent
            # precision downgrade from the explicitly requested f32
            raise ValueError(
                f"schedule='kloop' supports mode 'split'/'split2', "
                f"not {mode!r}; use schedule='block8'")
        if not fits_vmem_loop(m_pad, n_pad, plan.tile_k,
                              plan.num_chunks, plan.chunk):
            raise ValueError(
                "kloop payload (output + all chunks resident) exceeds "
                "VMEM; use schedule='block8'")
        start, end, rt, rows, cols, vals = _kmajor_loop(plan)
        out = _cres_kloop_spmm(
            start, end, rt, rows, cols, vals, b_padded,
            tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
            num_row_tiles=plan.num_row_tiles, num_k_tiles=plan.num_k_tiles,
            interpret=should_interpret(interpret), mode=mode,
        )
        return out[:m, :n]
    rt8, kt8, rows, cols, vals, nblocks = _kmajor_blocks(plan)
    out = _cres_spmm(
        rt8, kt8, rows, cols, vals, b_padded,
        tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
        num_row_tiles=plan.num_row_tiles, nblocks=nblocks,
        interpret=should_interpret(interpret), mode=mode,
    )
    return out[:m, :n]
