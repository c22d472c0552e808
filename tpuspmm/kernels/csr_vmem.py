"""Pallas staged-B SpMM: dense operand resident in VMEM.

TPU-native counterpart of the reference's shared-memory staged kernel
`spmmCSRK4` (reference/src/spmm/csr/spmm_csr_k4.cu:12-79), which stages A
rows and whole B columns in CUDA shared memory and tree-reduces with warp
shuffles.  Here the padded B is pinned in VMEM (the 16-128 MiB TPU
analogue of the 48 KiB smem budget), the grid walks row tiles, and each row
tile's nnz chunks are densified and matmul'd against dynamically-sliced B
panels — zero HBM re-reads of B per row tile.

When whole B exceeds the budget, B is staged in **k-slabs**: the grid
gains a minor slab dimension, each (row tile, slab) step stages one
(slab_k × n) horizontal stripe of B, chunks are grouped per (row tile,
slab) host-side, and the output block accumulates across the slab steps
(same revisit pattern as a tiled matmul's contraction dimension).  This
widens admission from "B fits VMEM" to "one tile_k stripe of B fits" —
the whole medium corpus at on-disk widths, where the whole-B stage was
inadmissible.

Like the reference kernel, admission is gated by a fit heuristic
(spmm_csr_k4.cu:91-101): `max_slab_k` must be ≥ tile_k or the caller
falls back to the streaming tile kernel.
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
    tile_k: int = 128,
) -> bool:
    b_bytes = k_pad * n_pad * 4
    out_bytes = tile_m * n_pad * 4
    if (b_bytes + 2 * out_bytes + chunk_bytes) > budget_bytes:
        return False
    # scoped-VMEM sanity for wide outputs: the per-chunk ephemerals grow
    # with n (see max_slab_k) and share the 16 MiB scoped stack with the
    # staged B — a narrow-k/wide-n shape can pass the residency budget
    # yet overflow the stack (same ≈4.5 f32 (tile_k, n) buffers max_slab_k
    # accounts for)
    scratch = 18 * tile_k * n_pad
    return (b_bytes + 2 * out_bytes + chunk_bytes
            + scratch) <= 15 * 1024 * 1024


def max_slab_k(
    k_pad: int, n_pad: int, tile_m: int, tile_k: int,
    budget_bytes: int = 8 * 1024 * 1024, chunk_bytes: int = 0,
) -> int:
    """Largest k-slab height (a multiple of tile_k, ≤ k_pad) whose B
    stripe fits the VMEM stage alongside the output tile and the chunk
    payload; 0 when not even one tile_k stripe fits (→ inadmissible).

    Two caps apply, and the slab takes the tighter:

    - the residency budget (same policy knob as the whole-B gate):
      slab + output tile + chunk payload ≤ ``budget_bytes``;
    - the chip's SCOPED VMEM limit (16 MiB on v5e): unlike the whole-B
      stage (a grid-constant block) the slab block's index varies with
      the grid step, so Pallas double-buffers it, and the kernel's
      per-chunk ephemerals (the sliced b_panel, its bf16 split terms,
      the gathered (chunk, n) intermediates, the accumulator) live on
      the same scoped stack — measured ≈ 4.5 (tile_k × n) f32 buffers
      on v5e, where a single-buffered model overflowed the 16 MiB limit
      by 1.2 MiB on medium_2048 at slab_k 640.  15 MiB is used as the
      margin-adjusted limit."""
    by_budget = budget_bytes - 2 * tile_m * n_pad * 4 - chunk_bytes
    scratch = 18 * tile_k * n_pad  # ≈4.5 f32 (tile_k, n) ephemerals
    by_scoped = (15 * 1024 * 1024 - 2 * tile_m * n_pad * 4 - chunk_bytes
                 - scratch) // 2
    avail = min(by_budget, by_scoped)
    if avail <= 0:
        return 0
    slab = (avail // (n_pad * 4)) // tile_k * tile_k
    return int(min(max(slab, 0), k_pad))


def _kernel(kt_ref, start_ref, end_ref, rows_ref, cols_ref, vals_ref, b_ref,
            out_ref, *, tm, tk, chunk, mode, num_slabs, kts_per_slab):
    rt = pl.program_id(0)
    s = pl.program_id(1)
    n = out_ref.shape[1]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, chunk), 0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, tk), 1)

    def body(j, acc):
        rows = rows_ref[j, :]
        cols = cols_ref[j, :]
        vals = vals_ref[j, :]
        # kt is global; the staged B block is this step's slab stripe,
        # so index it slab-locally (kts_per_slab = num_k_tiles when the
        # whole B is staged, making the offset a no-op)
        b_panel = b_ref[pl.ds((kt_ref[j] - s * kts_per_slab) * tk, tk), :]
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

    idx = rt * num_slabs + s
    acc = jax.lax.fori_loop(start_ref[idx], end_ref[idx], body,
                            jnp.zeros((tm, n), dtype=jnp.float32))
    if num_slabs == 1:
        out_ref[...] = acc
    else:
        # the output block is revisited across the (minor) slab steps —
        # initialize on the first slab, accumulate on the rest
        @pl.when(s == 0)
        def _init():
            out_ref[...] = acc

        @pl.when(s > 0)
        def _accum():
            out_ref[...] += acc


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tk", "chunk", "num_row_tiles", "num_slabs",
                     "slab_k", "interpret", "mode"),
)
def _staged_spmm(kt, start, end, rows, cols, vals, b_padded, *, tm, tk, chunk,
                 num_row_tiles, num_slabs=1, slab_k=None, interpret,
                 mode="split"):
    n_pad = b_padded.shape[1]
    num_chunks = rows.shape[0]
    slab_k = b_padded.shape[0] if slab_k is None else slab_k

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # kt, start, end
        grid=(num_row_tiles, num_slabs),
        in_specs=[
            pl.BlockSpec((num_chunks, chunk), lambda r, s, *_: (0, 0)),
            pl.BlockSpec((num_chunks, chunk), lambda r, s, *_: (0, 0)),
            pl.BlockSpec((num_chunks, chunk), lambda r, s, *_: (0, 0)),
            # whole-B (num_slabs==1) must stay a provably grid-constant
            # block — a grid-dependent (s, 0) map over an extent-1 dim
            # risks Mosaic double-buffering whole B, breaking fits_vmem's
            # single-buffered model near the budget edge
            pl.BlockSpec((slab_k, n_pad),
                         (lambda r, s, *_: (0, 0)) if num_slabs == 1
                         else (lambda r, s, *_: (s, 0))),
        ],
        out_specs=pl.BlockSpec((tm, n_pad), lambda r, s, *_: (r, 0)),
    )

    return pl.pallas_call(
        functools.partial(_kernel, tm=tm, tk=tk, chunk=chunk, mode=mode,
                          num_slabs=num_slabs,
                          kts_per_slab=slab_k // tk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_row_tiles * tm, n_pad), jnp.float32),
        interpret=interpret,
    )(kt, start, end, rows, cols, vals, b_padded)


def _slab_arrays(plan: TilePlan, num_slabs: int, kts_per_slab: int):
    """Chunk arrays stably reordered by (row tile, slab) plus per-(rt,
    slab) contiguous ranges — cached on the plan (the reorder and the
    device transfer happen once; serving reuses the arrays)."""
    import numpy as np

    cache = getattr(plan, "_slab_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(plan, "_slab_cache", cache)
    key = (num_slabs, kts_per_slab)
    if key not in cache:
        rt = np.asarray(plan.rt).astype(np.int64)
        kt = np.asarray(plan.kt)
        # kt is non-decreasing within each rt EXCEPT the all-sentinel
        # padding chunks (kt=0, appended to the last rt) — a stable sort
        # on the combined key restores per-(rt, slab) contiguity; the
        # pads land in slab 0 where their sentinel rows contribute 0
        slab = np.minimum(kt // kts_per_slab, num_slabs - 1).astype(np.int64)
        keyv = rt * num_slabs + slab
        order = np.argsort(keyv, kind="stable")
        bounds = np.searchsorted(
            keyv[order], np.arange(plan.num_row_tiles * num_slabs + 1))
        cache[key] = (
            jnp.asarray(np.asarray(plan.kt)[order]),
            jnp.asarray(bounds[:-1].astype(np.int32)),
            jnp.asarray(bounds[1:].astype(np.int32)),
            jnp.asarray(np.asarray(plan.rows)[order]),
            jnp.asarray(np.asarray(plan.cols)[order]),
            jnp.asarray(np.asarray(plan.vals)[order]),
        )
    return cache[key]


def spmm_staged(a_or_plan, b, interpret=None, budget_bytes: int = 8 * 1024 * 1024,
                mode: str = "split"):
    plan = a_or_plan if isinstance(a_or_plan, TilePlan) else plan_from_container(a_or_plan)
    m, k = plan.shape
    n = b.shape[1]
    n_pad = round_up(n, 128)
    k_pad = plan.num_k_tiles * plan.tile_k
    chunk_bytes = plan.num_chunks * plan.chunk * 12
    if fits_vmem(k_pad, n_pad, plan.tile_m, budget_bytes, chunk_bytes,
                 tile_k=plan.tile_k):
        b_padded = pad_b(jnp.asarray(b), k_pad, n_pad)
        start, end = plan.chunk_ranges()
        out = _staged_spmm(
            jnp.asarray(plan.kt), jnp.asarray(start), jnp.asarray(end),
            jnp.asarray(plan.rows), jnp.asarray(plan.cols),
            jnp.asarray(plan.vals), b_padded,
            tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
            num_row_tiles=plan.num_row_tiles,
            interpret=should_interpret(interpret), mode=mode,
        )
        return out[:m, :n]
    # k-slab staging: one (slab_k x n) stripe of B in VMEM per grid step
    slab_k = max_slab_k(k_pad, n_pad, plan.tile_m, plan.tile_k,
                        budget_bytes, chunk_bytes)
    if slab_k < plan.tile_k:
        raise ValueError(
            f"not even one ({plan.tile_k}x{n_pad}) stripe of B + chunks "
            "fits the VMEM stage budget; use spmm_tiles")
    num_slabs = -(-k_pad // slab_k)
    kt2, start2, end2, rows2, cols2, vals2 = _slab_arrays(
        plan, num_slabs, slab_k // plan.tile_k)
    b_padded = pad_b(jnp.asarray(b), num_slabs * slab_k, n_pad)
    out = _staged_spmm(
        kt2, start2, end2, rows2, cols2, vals2, b_padded,
        tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
        num_row_tiles=plan.num_row_tiles, num_slabs=num_slabs,
        slab_k=slab_k, interpret=should_interpret(interpret), mode=mode,
    )
    return out[:m, :n]
