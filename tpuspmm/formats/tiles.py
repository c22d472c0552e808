"""Tile-plan preprocessing: unstructured sparsity → MXU-sized tile chunks.

This is the TPU answer to the reference's CUDA decompositions (SURVEY.md
§2.4).  Where the CUDA kernels assign threads to output elements
(spmm_csr_k1.cu:12-34), warps to nnz chunks (spmm_csr_k2.cu:46-53), or
threads to nonzeros (spmm_coo_k1.cu:8-27), the TPU has one wide core per
chip and a 128×128 systolic array — so the unit of work is a *tile pair*:
a (TM × TK) tile of A against a (TK × TN) panel of B.

`build_tile_plan` groups the nonzeros of any format (via row/col/val
triplets) by (row-tile, k-tile), orders groups row-tile-major, and splits
each group into fixed-size chunks of E nonzeros (padded with sentinel
row=-1).  The Pallas kernel densifies each chunk into its A tile with two
iota-compare one-hot matmuls on the MXU and multiplies against the B panel
— nnz-balanced static-shape work, the merge-path idea
(reference K2's warp rotation, spmm_csr_k2.cu:10-58) without divergence.

Every row tile gets at least one (possibly all-sentinel) chunk so the
kernel's first-visit store zero-fills empty output tiles.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class TilePlan:
    """Static-shape chunked tiling of a sparse matrix (host-built)."""

    # per-chunk scalars (prefetched into SMEM by the kernel)
    rt: np.ndarray  # (C,) int32 — row-tile id, non-decreasing
    kt: np.ndarray  # (C,) int32 — k-tile id
    first: np.ndarray  # (C,) int32 — 1 iff first chunk of its row tile
    # per-chunk nnz payload
    rows: np.ndarray  # (C, E) int32 — row offset within tile, -1 = padding
    cols: np.ndarray  # (C, E) int32 — col offset within tile
    vals: np.ndarray  # (C, E) float32

    shape: Tuple[int, int]
    tile_m: int
    tile_k: int
    chunk: int

    @property
    def num_chunks(self) -> int:
        return int(self.rt.shape[0])

    @property
    def num_row_tiles(self) -> int:
        return _cdiv(self.shape[0], self.tile_m)

    @property
    def num_k_tiles(self) -> int:
        return _cdiv(self.shape[1], self.tile_k)

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return (self.num_row_tiles * self.tile_m, self.num_k_tiles * self.tile_k)

    def device_arrays(self):
        """(rt, kt, first, rows, cols, vals) as device arrays, transferred
        once and cached — steady-state calls must not re-pay H2D."""
        cached = getattr(self, "_device_arrays", None)
        if cached is None:
            import jax.numpy as jnp

            cached = tuple(jnp.asarray(x) for x in
                           (self.rt, self.kt, self.first,
                            self.rows, self.cols, self.vals))
            object.__setattr__(self, "_device_arrays", cached)
        return cached

    # chunks-per-row-tile bookkeeping for the staged-B kernel
    def chunk_ranges(self) -> Tuple[np.ndarray, np.ndarray]:
        """(start, end) chunk index per row tile."""
        nrt = self.num_row_tiles
        start = np.zeros(nrt, dtype=np.int32)
        end = np.zeros(nrt, dtype=np.int32)
        # rt is sorted non-decreasing and covers every row tile
        boundaries = np.searchsorted(self.rt, np.arange(nrt + 1))
        start[:] = boundaries[:-1]
        end[:] = boundaries[1:]
        return start, end


def build_tile_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: Tuple[int, int],
    tile_m: int = 128,
    tile_k: int = 128,
    chunk: int = 128,
) -> TilePlan:
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    nrt = _cdiv(shape[0], tile_m)
    nkt = _cdiv(shape[1], tile_k)

    tile_r = rows // tile_m
    tile_k_ids = cols // tile_k
    # sort by (tile_r, tile_k) then row/col for locality
    order = np.lexsort((cols, rows, tile_k_ids, tile_r))
    rows, cols, vals = rows[order], cols[order], vals[order]
    tile_r, tile_k_ids = tile_r[order], tile_k_ids[order]

    group_key = tile_r * nkt + tile_k_ids
    # group boundaries
    if len(group_key):
        gb = np.flatnonzero(np.diff(group_key)) + 1
        starts = np.concatenate([[0], gb])
        ends = np.concatenate([gb, [len(group_key)]])
    else:
        starts = np.zeros(0, dtype=np.int64)
        ends = np.zeros(0, dtype=np.int64)

    chunk_rt, chunk_kt, chunk_slices = [], [], []
    for s, e in zip(starts, ends):
        g_rt = int(tile_r[s])
        g_kt = int(tile_k_ids[s])
        for cs in range(int(s), int(e), chunk):
            chunk_rt.append(g_rt)
            chunk_kt.append(g_kt)
            chunk_slices.append((cs, min(cs + chunk, int(e))))

    # ensure every row tile has at least one chunk (zero-fill semantics)
    present = np.zeros(nrt, dtype=bool)
    for r in chunk_rt:
        present[r] = True
    for r in range(nrt):
        if not present[r]:
            chunk_rt.append(r)
            chunk_kt.append(0)
            chunk_slices.append((0, 0))

    # order chunks by row tile (stable: keeps k-tile grouping within)
    corder = np.argsort(np.asarray(chunk_rt, dtype=np.int64), kind="stable")
    C = len(corder)
    E = chunk
    # pad the chunk count to a multiple of 8 so the kernel can read chunk
    # payloads through (8, E)-shaped VMEM blocks (TPU sublane tiling);
    # padding chunks are all-sentinel and attach to the last row tile
    C_pad = _cdiv(max(C, 1), 8) * 8

    out_rt = np.zeros(C_pad, dtype=np.int32)
    out_kt = np.zeros(C_pad, dtype=np.int32)
    out_first = np.zeros(C_pad, dtype=np.int32)
    out_rows = np.full((C_pad, E), -1, dtype=np.int32)
    out_cols = np.zeros((C_pad, E), dtype=np.int32)
    out_vals = np.zeros((C_pad, E), dtype=np.float32)

    prev_rt = -1
    for ci, gi in enumerate(corder):
        g_rt, g_kt = chunk_rt[gi], chunk_kt[gi]
        s, e = chunk_slices[gi]
        n = e - s
        out_rt[ci] = g_rt
        out_kt[ci] = g_kt
        out_first[ci] = 1 if g_rt != prev_rt else 0
        prev_rt = g_rt
        if n:
            out_rows[ci, :n] = (rows[s:e] - g_rt * tile_m).astype(np.int32)
            out_cols[ci, :n] = (cols[s:e] - g_kt * tile_k).astype(np.int32)
            out_vals[ci, :n] = vals[s:e]

    # padding chunks (C..C_pad) attach to the last visited row tile so the
    # grid order stays row-tile-monotonic; all-sentinel rows contribute 0
    if C_pad > C:
        last_rt = out_rt[C - 1] if C else 0
        out_rt[C:] = last_rt
        # first=0: never re-zero the tile; kt=0 is safe (B tile 0 unused)

    return TilePlan(
        rt=out_rt, kt=out_kt, first=out_first,
        rows=out_rows, cols=out_cols, vals=out_vals,
        shape=tuple(shape), tile_m=tile_m, tile_k=tile_k, chunk=chunk,
    )


def plan_from_container(a, tile_m=128, tile_k=128, chunk=128) -> TilePlan:
    """Lower any tpuspmm container to a TilePlan via its triplets.

    Plans are cached on the (frozen, immutable) container so repeated
    SpMM calls with the same matrix — the serving steady state — pay the
    host preprocessing once.
    """
    from tpuspmm.formats import CSR, COO, BSR, ELL

    key = (tile_m, tile_k, chunk)
    cache = getattr(a, "_plan_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(a, "_plan_cache", cache)
        except Exception:
            cache = None
    if cache is not None and key in cache:
        return cache[key]

    if isinstance(a, COO):
        coo = a
    elif isinstance(a, CSR):
        coo = a.to_coo()
    elif isinstance(a, ELL):
        coo = a.to_coo()
    elif isinstance(a, BSR):
        coo = a.to_csr().to_coo()
    else:
        raise TypeError(type(a))
    plan = build_tile_plan(
        np.asarray(coo.rows), np.asarray(coo.cols), np.asarray(coo.values),
        coo.shape, tile_m=tile_m, tile_k=tile_k, chunk=chunk,
    )
    if cache is not None:
        cache[key] = plan
    return plan
