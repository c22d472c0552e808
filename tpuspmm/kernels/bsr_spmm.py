"""Pallas BSR SpMM: MXU block-streaming (megablox-style).

TPU-native counterpart of the reference BSR kernel
(reference/src/spmm/bsr/spmm_bsr_k1.cu:8-41), which maps one CUDA thread
block per block-row and atomicAdds per-element contributions.  On TPU the
stored blocks *are* MXU operands: the grid walks the stored blocks in
block-row order (scalar-prefetched block-row / block-col ids), the pipeline
streams each block's (bw × TN) B panel HBM→VMEM, and each step is a single
`jnp.dot` accumulated into the VMEM-resident output tile — no atomics,
no densification, pure systolic-array streaming.

Requires MXU-friendly stored blocks (block_h multiple of 8, block_w multiple
of 128).  Smaller logical blocks (e.g. the 4×4 pruned-LLM pattern,
BASELINE.json config 4) are routed through `pack_blocks` which re-tiles the
matrix to (128, 128) super-blocks, or through the tile-sparse densify kernel
when super-blocking would blow up memory.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuspmm.kernels.common import round_up, should_interpret, pad_b
from tpuspmm.formats.bsr import BSR


def _kernel(rt_ref, kt_ref, first_ref, blocks_ref, b_ref, out_ref):
    i = pl.program_id(1)
    contrib = jnp.dot(blocks_ref[0], b_ref[...], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)

    @pl.when(first_ref[i] == 1)
    def _():
        out_ref[...] = contrib

    @pl.when(first_ref[i] != 1)
    def _():
        out_ref[...] += contrib


@functools.partial(
    jax.jit,
    static_argnames=("block_h", "block_w", "num_block_rows", "tile_n", "interpret"),
)
def _bsr_spmm(rt, kt, first, blocks, b_padded, *, block_h, block_w, num_block_rows, tile_n, interpret):
    nblocks = blocks.shape[0]
    n_pad = b_padded.shape[1]
    n_tiles = n_pad // tile_n

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles, nblocks),
        in_specs=[
            pl.BlockSpec((1, block_h, block_w), lambda n, i, rt_ref, kt_ref, first_ref: (i, 0, 0)),
            pl.BlockSpec((block_w, tile_n), lambda n, i, rt_ref, kt_ref, first_ref: (kt_ref[i], n)),
        ],
        out_specs=pl.BlockSpec(
            (block_h, tile_n), lambda n, i, rt_ref, kt_ref, first_ref: (rt_ref[i], n)
        ),
    )

    flops = 2 * nblocks * block_h * block_w * n_pad
    bytes_accessed = nblocks * block_h * block_w * 4 + nblocks * block_w * n_pad * 4 + num_block_rows * block_h * n_pad * 4

    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_block_rows * block_h, n_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=interpret,
    )(rt, kt, first, blocks, b_padded)


def _prep_bsr(a: BSR):
    """Host preprocessing: expand indptr to per-block row ids, first flags,
    and guarantee every block row has ≥1 (possibly zero) block.  Cached on
    the container as device arrays (transfer once, serve many)."""
    cached = getattr(a, "_stream_prep", None)
    if cached is not None:
        return cached
    indptr = np.asarray(a.indptr)
    nbr = a.num_block_rows
    counts = np.diff(indptr).astype(np.int64)
    rt = np.repeat(np.arange(nbr, dtype=np.int32), counts)
    kt = np.asarray(a.indices, dtype=np.int32)
    blocks = np.asarray(a.blocks, dtype=np.float32)
    empty = np.flatnonzero(counts == 0).astype(np.int32)
    if len(empty):
        rt = np.concatenate([rt, empty])
        kt = np.concatenate([kt, np.zeros(len(empty), dtype=np.int32)])
        zeros = np.zeros((len(empty),) + blocks.shape[1:], dtype=np.float32)
        blocks = np.concatenate([blocks, zeros], axis=0) if blocks.size else zeros
        order = np.argsort(rt, kind="stable")
        rt, kt, blocks = rt[order], kt[order], blocks[order]
    first = np.zeros(len(rt), dtype=np.int32)
    first[0] = 1
    first[1:] = (rt[1:] != rt[:-1]).astype(np.int32)
    out = tuple(jnp.asarray(x) for x in (rt, kt, first, blocks))
    if any(isinstance(x, jax.core.Tracer) for x in out):
        return out  # converted under a trace — caching would leak tracers
    try:
        object.__setattr__(a, "_stream_prep", out)
    except Exception:
        pass
    return out


def mxu_friendly(block_size) -> bool:
    bh, bw = block_size
    return bh % 8 == 0 and bw % 128 == 0


def pack_blocks(a: BSR, super_block=(128, 128)) -> Optional[BSR]:
    """Re-tile small-block BSR into MXU-sized super-blocks when the fill-in
    is acceptable (≤4× storage growth); returns None otherwise.  Cached on
    the container (the repack is an expensive host transform)."""
    cache = getattr(a, "_packed_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(a, "_packed_cache", cache)
        except Exception:
            cache = None
    if cache is not None and super_block in cache:
        return cache[super_block]
    packed = _pack_blocks_impl(a, super_block)
    if cache is not None:
        cache[super_block] = packed
    return packed


def _pack_blocks_impl(a: BSR, super_block) -> Optional[BSR]:
    sp = a.to_scipy().tocsr()
    try:
        m = sp.tobsr(blocksize=super_block)
    except ValueError:
        return None
    dense_bytes = m.data.size * 4
    if a.blocks.size and dense_bytes > 4 * a.blocks.size * 4:
        return None
    return BSR.from_scipy(m, block_size=super_block)


def spmm_bsr_stream(a: BSR, b, tile_n: Optional[int] = None, interpret=None):
    """Container-level entry for the block-streaming kernel."""
    assert mxu_friendly(a.block_size), (
        f"block size {a.block_size} is not MXU-friendly; use pack_blocks or the tile-sparse kernel"
    )
    m, k = a.shape
    n = b.shape[1]
    interp = should_interpret(interpret)
    tile_n = tile_n or min(round_up(n, 128), 512)
    n_pad = round_up(n, tile_n)
    bw = a.block_size[1]
    k_pad = round_up(k, bw)
    b_padded = pad_b(jnp.asarray(b), k_pad, n_pad)

    rt, kt, first, blocks = _prep_bsr(a)
    out = _bsr_spmm(
        rt, kt, first, blocks, b_padded,
        block_h=a.block_size[0], block_w=bw,
        num_block_rows=a.num_block_rows, tile_n=tile_n, interpret=interp,
    )
    return out[:m, :n]
