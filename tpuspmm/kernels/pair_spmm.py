"""Pallas run-length panel SpMM: zero stored-plan padding.

The panel kernel (panel_spmm.py) trades two costs against each other
through its strip count P: per-panel grid-step overhead (wants large P)
versus padding every (supertile, k-tile) pair's strip list to a multiple
of P (wants small P — measured 18-46% stored-plan waste on the corpus at
the step-optimal P).  This kernel removes the tradeoff: each pair's
exact strip run is chopped into CH-strip chunks at plan-build time, the
grid runs over the CHUNKS, and the stacked plan stores no padding at
all:

    for each chunk q (CH strips at arbitrary offset cstart[q]):
        DMA strips [cstart, cstart+CH) of the plan HBM→VMEM   # unaligned
        acc = chunk @ B[ckt[q]·tk : +tk, :]                   # MXU, dense
        for each strip i < ccount[q]:  C[offs[cstart+i], :] += acc_strip

Chunk runs start at arbitrary (unaligned) strip offsets, which a
BlockSpec index map cannot express — hence the manual `make_async_copy`
from an ANY-space plan array, the Pallas answer to CUDA's free-form
global-memory pointer arithmetic (cf. the reference's per-warp dynamic
row walks, reference/src/spmm/csr/spmm_csr_k2.cu:10-58).  The copies are
software-pipelined ACROSS grid steps (step q issues chunk q+1's DMA into
the other ping-pong slot before waiting on its own), so no copy latency
is exposed anywhere, including pair boundaries.  A pair's last chunk
reads past its run into the next pair's strips; those rows are masked to
the local trash strip, and the plan carries CH tail strips of zeros so
the DMA never overruns the array.  B tiles and the output slab keep the
ordinary pipelined BlockSpecs (kt- and supertile-indexed), so their
streaming behaviour is identical to the panel kernel's.

Same precision tiers as the panel kernel (panel_spmm.panel_matmul);
plans compact to bf16 under the same lossless-values rule.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuspmm.kernels.common import round_up, should_interpret, pad_b
from tpuspmm.kernels.panel_spmm import (
    ORDER_KINDS,
    PLAN_BYTES_CAP,
    _container_cache,
    _dedupe_triplets,
    _geom_disk_key,
    _geom_disk_load,
    _geom_disk_store,
    _occupied_strip_groups,
    _order_candidates,
    _order_perm,
    _st_strip_counts_from_groups,
    normalize_panel_mode,
    finish_panel_output,
    panel_matmul,
    values_bf16_exact,
)

# default strips per DMA chunk when the caller pins one (the geometry
# resolver searches {64,32,16,8}): 32 strips = a (256, 128) LHS block —
# a full-height MXU operand, 64/128 KiB per copy (bf16/f32)
CHUNK_STRIPS = 32


@dataclasses.dataclass(frozen=True)
class PairPlan:
    """Run-length panel plan: strips grouped per (supertile, k-tile)
    pair with NO padding; per-pair runs are walked in-kernel."""

    kt: np.ndarray      # (n_pairs,) int32 — k-tile id
    st: np.ndarray      # (n_pairs,) int32 — supertile id (ascending;
    #                     every supertile appears, possibly count=0)
    start: np.ndarray   # (n_pairs,) int32 — first strip index
    count: np.ndarray   # (n_pairs,) int32 — strips in this pair
    offs: np.ndarray    # (n_strips + CH,) int32 — supertile-LOCAL C row
    #                     offset per strip; the CH-strip tail is trash
    a_dense: np.ndarray  # ((n_strips + CH)·tm, tk) — stacked strips,
    #                     f32 or bf16 (lossless store; CH zero tail)

    shape: Tuple[int, int]
    tm: int
    tk: int
    chunk_strips: int   # CH
    sm: int             # supertile rows; == m_pad for one supertile
    row_perm: np.ndarray | None = None

    @property
    def n_pairs(self) -> int:
        return int(self.kt.shape[0])

    @property
    def n_strips(self) -> int:
        return int(self.offs.shape[0]) - self.chunk_strips

    @property
    def m_pad(self) -> int:
        return round_up(self.shape[0], self.tm)

    @property
    def n_supertiles(self) -> int:
        return -(-self.m_pad // self.sm)

    @property
    def num_k_tiles(self) -> int:
        return -(-self.shape[1] // self.tk)

    @property
    def plan_bytes(self) -> int:
        return int(self.a_dense.nbytes)

    def chunk_arrays(self):
        """Per-chunk grid arrays (c_kt, c_st, c_start, c_count) derived
        from the pair runs — the kernel grid runs over chunks, one
        CH-strip DMA each (host numpy, cached)."""
        cached = getattr(self, "_chunk_arrays", None)
        if cached is None:
            cached = build_chunk_arrays(self.kt, self.st, self.start,
                                        self.count, self.chunk_strips,
                                        self.n_strips)
            object.__setattr__(self, "_chunk_arrays", cached)
        return cached

    def device_arrays(self):
        """Device copies, transferred once and cached (same tracer-leak
        guard as PanelPlan.device_arrays)."""
        cached = getattr(self, "_device_arrays", None)
        if cached is None:
            cached = tuple(jnp.asarray(x) for x in
                           (*self.chunk_arrays(), self.offs, self.a_dense))
            if any(isinstance(x, jax.core.Tracer) for x in cached):
                return cached
            object.__setattr__(self, "_device_arrays", cached)
        return cached


def build_chunk_arrays(kt, st, start, count, chunk_strips: int,
                       n_strips: int):
    """Chop each pair's strip run into CH-strip chunks.  Empty pairs
    (missing-supertile fillers) keep ONE chunk with count 0 pointing at
    the zero tail, so the slab zero-init still fires for their supertile
    and the DMA stays in bounds."""
    CH = chunk_strips
    kt = np.asarray(kt, np.int32)
    st = np.asarray(st, np.int32)
    start = np.asarray(start, np.int64)
    count = np.asarray(count, np.int64)
    nch = np.maximum(1, -(-count // CH))
    c_pair = np.repeat(np.arange(len(kt)), nch)
    within = np.arange(len(c_pair)) - np.repeat(
        np.concatenate([[0], np.cumsum(nch)[:-1]]), nch)
    c_start = np.where(count[c_pair] > 0,
                       start[c_pair] + within * CH,
                       n_strips).astype(np.int32)
    c_count = np.clip(count[c_pair] - within * CH, 0, CH).astype(np.int32)
    return (kt[c_pair], st[c_pair], c_start, c_count)


def build_pair_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: Tuple[int, int],
    tm: int = 8,
    tk: int = 128,
    chunk_strips: int = CHUNK_STRIPS,
    sm: int | None = None,
    row_perm: np.ndarray | None = None,
) -> PairPlan:
    """Group triplets by (supertile, k-tile, row-strip), densify each
    group into one (tm × tk) strip, and record per-(supertile, k-tile)
    strip runs — no padding beyond the global CH-strip zero tail."""
    if tm % 8:
        raise ValueError("tm must be a multiple of 8 (sublane alignment)")
    CH = chunk_strips
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    m, k = shape
    if row_perm is not None:
        inv = np.empty(m, np.int64)
        inv[np.asarray(row_perm, np.int64)] = np.arange(m)
        rows = inv[rows]
    rows, cols, vals = _dedupe_triplets(rows, cols, vals, k)
    store_bf16 = values_bf16_exact(vals)
    dtype = ml_dtypes.bfloat16 if store_bf16 else np.float32
    m_pad = round_up(m, tm)
    if sm is None:
        sm = m_pad
    if sm % tm or sm <= 0:
        raise ValueError("sm must be a positive multiple of tm")
    n_st = max(1, -(-m_pad // sm))
    strips_per_st = sm // tm

    rt = rows // tm
    ktile = cols // tk
    stile = rt // strips_per_st
    nrt = max(1, -(-m // tm))
    nkt = max(1, -(-k // tk))
    order = np.lexsort((rt, ktile, stile))
    rows, cols, vals = rows[order], cols[order], vals[order]
    rt, ktile, stile = rt[order], ktile[order], stile[order]

    group_key = (stile * nkt + ktile) * nrt + rt
    if len(group_key):
        gb = np.flatnonzero(np.diff(group_key)) + 1
        starts = np.concatenate([[0], gb]).astype(np.int64)
    else:
        starts = np.zeros(0, dtype=np.int64)
    g_rt = rt[starts] if len(starts) else np.zeros(0, np.int64)
    g_kt = ktile[starts] if len(starts) else np.zeros(0, np.int64)
    g_st = stile[starts] if len(starts) else np.zeros(0, np.int64)
    n_strips = len(starts)

    # pair runs: groups are (st, kt)-major sorted → consecutive
    pair_key = g_st * nkt + g_kt
    pairs_unique, pair_counts = (np.unique(pair_key, return_counts=True)
                                 if n_strips else
                                 (np.zeros(0, np.int64),
                                  np.zeros(0, np.int64)))
    pair_start = (np.concatenate([[0], np.cumsum(pair_counts)[:-1]])
                  if len(pair_counts) else np.zeros(0, np.int64))
    kt_arr = (pairs_unique % nkt).astype(np.int32)
    st_arr = (pairs_unique // nkt).astype(np.int32)
    start_arr = pair_start.astype(np.int32)
    count_arr = pair_counts.astype(np.int32)

    # every supertile must appear (slab zero-init + flush coverage)
    missing = np.setdiff1d(np.arange(n_st), st_arr)
    if len(missing):
        kt_arr = np.concatenate([kt_arr, np.zeros(len(missing), np.int32)])
        st_arr = np.concatenate([st_arr, missing.astype(np.int32)])
        start_arr = np.concatenate(
            [start_arr, np.full(len(missing), n_strips, np.int32)])
        count_arr = np.concatenate(
            [count_arr, np.zeros(len(missing), np.int32)])
        perm = np.lexsort((kt_arr, st_arr))
        kt_arr, st_arr = kt_arr[perm], st_arr[perm]
        start_arr, count_arr = start_arr[perm], count_arr[perm]

    # strip offsets (supertile-local), trash tail
    offs = np.full(n_strips + CH, sm, np.int32)
    offs[:n_strips] = (g_rt * tm - g_st * sm).astype(np.int32)

    # densify: slots are unique after dedupe — pure placement
    g_sizes = np.diff(np.concatenate([starts, [len(rows)]]))
    trip_group = np.repeat(np.arange(n_strips), g_sizes)
    r_local = rows - g_rt[trip_group] * tm
    c_local = cols - g_kt[trip_group] * tk
    flat = (trip_group * tm + r_local) * tk + c_local
    a_dense = np.zeros((n_strips + CH) * tm * tk, dtype)
    a_dense[flat] = vals.astype(dtype)
    a_dense = a_dense.reshape((n_strips + CH) * tm, tk)

    return PairPlan(kt=kt_arr, st=st_arr, start=start_arr, count=count_arr,
                    offs=offs, a_dense=a_dense, shape=tuple(shape), tm=tm,
                    tk=tk, chunk_strips=CH, sm=sm, row_perm=row_perm)


def _pair_kernel(ckt_ref, cst_ref, cstart_ref, ccount_ref, offs_ref,
                 a_hbm, b_ref, out_ref, bufs, sems, *, tm, CH, mode, sm):
    """One grid step per CH-strip chunk of a pair's run.  The plan DMA is
    software-pipelined ACROSS grid steps: step q issues chunk q+1's copy
    into the other ping-pong slot before waiting on its own, so no DMA
    latency is exposed at pair boundaries (a per-pair inner DMA loop
    would stall one copy latency at the start of every pair — with a few
    hundred pairs that bubble rivals the whole kernel budget)."""
    nt = pl.program_id(0)      # output-width tile (usually the only one)
    q = pl.program_id(1)       # chunk id; the plan re-streams per nt
    n_chunks = pl.num_programs(1)
    s = nt * n_chunks + q      # linearized step for slot parity / lookahead
    last = pl.num_programs(0) * n_chunks - 1

    def dma(i, slot):
        return pltpu.make_async_copy(
            a_hbm.at[pl.ds(cstart_ref[i] * tm, CH * tm), :],
            bufs.at[slot], sems.at[slot])

    @pl.when(s == 0)
    def _():
        dma(0, 0).start()

    @pl.when(s < last)
    def _():
        # next step's chunk: q+1, or chunk 0 when the next width tile
        # restarts the plan stream
        dma(jnp.where(q + 1 < n_chunks, q + 1, 0), (s + 1) % 2).start()

    first = jnp.logical_or(
        q == 0, cst_ref[q] != cst_ref[jnp.maximum(q - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    slot = s % 2
    dma(q, slot).wait()
    acc = panel_matmul(bufs[slot], b_ref[...], mode)
    start = cstart_ref[q]
    count = ccount_ref[q]
    for i in range(CH):
        # strips past this chunk's count belong to the NEXT pair (their
        # values would multiply the wrong B tile) — mask to trash
        off = jnp.where(i < count, offs_ref[start + i], sm)
        off = pl.multiple_of(off, tm)
        out_ref[pl.ds(off, tm), :] += acc[i * tm:(i + 1) * tm, :]


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tk", "chunk_strips", "sm", "n_st", "interpret",
                     "mode", "tile_n"),
)
def _pair_spmm(c_kt, c_st, c_start, c_count, offs, a_dense, b_padded,
               *, tm, tk, chunk_strips, sm, n_st, interpret,
               mode="highest", tile_n=None):
    CH = chunk_strips
    n_pad = b_padded.shape[1]
    if tile_n is None:
        tile_n = n_pad
    n_nt = n_pad // tile_n
    n_chunks = c_kt.shape[0]
    n_strips = offs.shape[0] - CH

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # c_kt, c_st, c_start, c_count, offs
        grid=(n_nt, n_chunks),
        in_specs=[
            # the stacked plan stays in HBM; the kernel DMAs strip runs
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            # one B tile per chunk, pipelined on the kt prefetch (the
            # block index repeats across a pair's chunks — no re-fetch)
            pl.BlockSpec((tk, tile_n),
                         lambda nt, q, kt_ref, *_: (kt_ref[q], nt)),
        ],
        out_specs=pl.BlockSpec(
            (sm + tm, tile_n),
            lambda nt, q, kt_ref, st_ref, *_: (st_ref[q], nt)),
        scratch_shapes=[
            pltpu.VMEM((2, CH * tm, tk), a_dense.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    a_bf = a_dense.dtype == jnp.bfloat16
    b_bf = b_padded.dtype == jnp.bfloat16
    if a_bf:
        passes = 1 if b_bf else (2 if mode == "split" else 3)
    elif mode == "split":
        passes = 2 if b_bf else 3
    elif b_bf:
        passes = 3
    else:
        passes = 6  # f32 HIGHEST
    flops = 2 * n_strips * tm * tk * n_pad * passes // 6
    bytes_accessed = (n_nt * a_dense.size * a_dense.dtype.itemsize
                      + n_chunks * tk * n_pad * b_padded.dtype.itemsize
                      + n_st * (sm + tm) * n_pad * 4)
    out = pl.pallas_call(
        functools.partial(_pair_kernel, tm=tm, CH=CH, mode=mode, sm=sm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_st * (sm + tm), n_pad),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(c_kt, c_st, c_start, c_count, offs, a_dense, b_padded)
    return out


def fits_vmem_pair(sm: int, tile_n: int, tm: int, tk: int,
                   budget_bytes: int = 8 * 1024 * 1024,
                   chunk_strips: int = CHUNK_STRIPS) -> bool:
    """``tile_n`` is the VMEM-resident output width (= padded B width
    unless the geometry width-tiles)."""
    out_bytes = (sm + tm) * tile_n * 4
    buf_bytes = 2 * chunk_strips * tm * tk * 4  # two ping-pong buffers
    b_bytes = 2 * tk * tile_n * 4               # double-buffered B tile
    acc_bytes = chunk_strips * tm * tile_n * 4  # chunk accumulator
    return out_bytes + buf_bytes + b_bytes + acc_bytes <= budget_bytes


def pick_supertile_rows_pair(m_pad: int, tile_n: int, tm: int, tk: int,
                             budget_bytes: int = 8 * 1024 * 1024,
                             chunk_strips: int = CHUNK_STRIPS) -> int | None:
    """Largest admissible supertile row count (multiple of tm); m_pad for
    a single supertile; None when even one strip does not fit."""
    if fits_vmem_pair(m_pad, tile_n, tm, tk, budget_bytes, chunk_strips):
        return m_pad
    buf_bytes = 2 * chunk_strips * tm * tk * 4
    b_bytes = 2 * tk * tile_n * 4
    acc_bytes = chunk_strips * tm * tile_n * 4
    margin = min(256 * 1024, budget_bytes // 8)
    avail = budget_bytes - buf_bytes - b_bytes - acc_bytes - margin
    sm = (avail // (tile_n * 4) - tm) // tm * tm
    if sm < tm:
        return None
    return min(sm, m_pad)


def _pair_search(m_pad, n_pad, tm, tk, nkt, strip_bytes, bw, step_us,
                 strip_us, perm_us, orders, order_kinds, groups, cnt_cache,
                 budget_bytes, plan_bytes_cap, chunk_strips):
    """The (tile_n, CH, order, supertiling) sweep of the pair cost model
    — shared by the winner resolver and the candidate enumerator.
    Returns (best, entries): ``best`` applies the resolver's 3%-win
    hysteresis in iteration order (CH 64→8, so ties keep the larger,
    fewer-steps chunk); ``entries`` is every admissible candidate at the
    winning tile width as (cost, perm, plan_bytes, sm, ch, tile_n,
    order_kind) tuples."""
    ch_candidates = ((chunk_strips,) if chunk_strips is not None
                     else (64, 32, 16, 8))
    tile_candidates = [d * 128 for d in range(n_pad // 128, 0, -1)
                       if n_pad % (d * 128) == 0]
    best = None
    entries = []
    for tile_n in tile_candidates:
        n_nt = n_pad // tile_n
        for ch in ch_candidates:
            if budget_bytes is None:
                sm = m_pad
            else:
                sm = pick_supertile_rows_pair(m_pad, tile_n, tm, tk,
                                              budget_bytes, chunk_strips=ch)
                if sm is None:
                    continue
            st_div = max(1, sm // tm)
            n_st = max(1, -(-m_pad // sm))
            for oi, (perm, prows) in enumerate(orders):
                ckey = (oi, st_div)
                if ckey not in cnt_cache:
                    cnt_cache[ckey] = _st_strip_counts_from_groups(
                        groups[oi], nkt, st_div)
                cnt, occ_st = cnt_cache[ckey]
                strips = int(cnt.sum())
                steps = (int(np.sum(-(-cnt // ch))) + (n_st - occ_st))
                plan_bytes = strips * strip_bytes
                if (plan_bytes_cap is not None
                        and plan_bytes > plan_bytes_cap):
                    continue
                cost = (n_nt * steps
                        * (step_us + ch * (strip_bytes / bw + strip_us))
                        + (perm_us if perm is not None else 0.0))
                entries.append((cost, perm, plan_bytes, sm, ch, tile_n,
                                order_kinds[oi]))
                if best is None or cost < best[0] * 0.97:
                    best = entries[-1]
        if best is not None:
            break  # widest admissible tile wins; narrower only re-streams
    return best, entries


PairGeometry = dataclasses.make_dataclass(
    "PairGeometry", ["row_perm", "sm", "chunk_strips", "plan_bytes",
                     "tile_n", ("order_kind", str, dataclasses.field(
                         default="natural")),
                     ("cost_us", object, dataclasses.field(default=None))])
# cost_us: the search's modelled serve time, same constants/units as
# PanelGeometry.cost_us — the heuristic dispatch compares the two.


def _pair_model_inputs(a, coo, rows, cols, m, k, n_pad, tm, tk,
                       reorder_rows, th):
    """Positional `_pair_search` model inputs (everything before the
    admission caps) — shared by the winner resolver and the candidate
    enumerator so the two can never price a geometry differently."""
    ktile = cols // tk
    val_bytes = (2 if plan_values_bf16_exact_cached(a, rows, cols,
                                                    coo.values, k) else 4)
    strip_bytes = tm * tk * val_bytes
    bw = th.get("panel_hbm_gbps", 250.0) * 1e3
    step_us = th.get("panel_step_us", 0.17)
    strip_us = th.get("panel_strip_us", 0.0)
    perm_us = (m * n_pad * 4 * 2
               / (th.get("panel_gather_gbps", 300.0) * 1e3))

    m_pad = round_up(max(m, tm), tm)
    nkt = max(1, -(-k // tk))

    orders = [(None, rows)]
    order_kinds = ["natural"]
    if reorder_rows and len(rows) and m > tm:
        for kind, perm in zip(ORDER_KINDS,
                              _order_candidates(rows, cols, m, ktile)):
            inv = np.empty(m, np.int64)
            inv[perm] = np.arange(m)
            orders.append((perm, inv[rows]))
            order_kinds.append(kind)
    # nnz-sized unique pass once per order; regroupings run on the small
    # group arrays (mirrors the panel search)
    groups = [_occupied_strip_groups(prows, ktile, nkt, tm)
              for _, prows in orders]
    return (m_pad, n_pad, tm, tk, nkt, strip_bytes, bw, step_us, strip_us,
            perm_us, orders, order_kinds, groups, {})


def resolve_pair_geometry_candidates(a, n_pad: int = 256, k: int = 3,
                                     tm: int = 8, tk: int = 128,
                                     reorder_rows: bool = True,
                                     budget_bytes: int | None = None,
                                     plan_bytes_cap: int | None = None):
    """The model's top-``k`` distinct pair geometries (cheapest first,
    the plain resolver's hysteresis winner leading) — the pair-family
    counterpart of panel_spmm.resolve_panel_geometry_candidates.  The
    round-3 CH ablation showed the measured-best chunk beat the model's
    resolved pick on 3 of 5 matrices (results/ablate_pair.jsonl:
    large_15120 0.0411 ms at CH=32 vs 0.0573 resolved), so the
    autotuner measures these instead of trusting the single pick."""
    from tpuspmm.kernels.dispatch import thresholds
    from tpuspmm.ops.xla import coo_view

    coo = coo_view(a)
    m, kk = coo.shape
    rows = np.asarray(coo.rows, np.int64)
    cols = np.asarray(coo.cols, np.int64)
    best, entries = _pair_search(
        *_pair_model_inputs(a, coo, rows, cols, m, kk, n_pad, tm, tk,
                            reorder_rows, thresholds()),
        budget_bytes, plan_bytes_cap, None)
    if best is None:
        return []
    seen, out = set(), []
    for e in [best] + sorted(entries, key=lambda e: e[0]):
        ident = (e[3], e[4], e[5], e[6])  # sm, ch, tile_n, order
        if ident in seen:
            continue
        seen.add(ident)
        out.append(PairGeometry(e[1], e[3], e[4], e[2], e[5], e[6],
                                float(e[0])))
        if len(out) >= k:
            break
    return out


def pin_pair_geometry(a, geom, n_pad: int = 256, tm: int = 8,
                      tk: int = 128, reorder_rows: bool = True,
                      budget_bytes: int | None = None,
                      plan_bytes_cap: int | None = None,
                      chunk_strips: int | None = None,
                      disk: bool = True) -> None:
    """Record ``geom`` as THE resolved pair geometry for these resolver
    args (container + disk cache) — see panel_spmm.pin_panel_geometry."""
    from tpuspmm.engine.report import detect_chip
    from tpuspmm.kernels.dispatch import thresholds

    key = ("pair_geom", detect_chip(initialize=False), tm, tk,
           reorder_rows, n_pad, budget_bytes, plan_bytes_cap, chunk_strips)
    cache = _container_cache(a)
    if cache is not None:
        cache[key] = geom
    if not disk:
        return  # transient (candidate-measurement) pin — this process only
    dkey = _geom_disk_key(a, key, thresholds())
    _geom_disk_store(dkey, None if geom is None else {
        "sm": int(geom.sm), "ch": int(geom.chunk_strips),
        "plan_bytes": int(geom.plan_bytes), "tile_n": int(geom.tile_n),
        "order": geom.order_kind,
        "cost": None if geom.cost_us is None else float(geom.cost_us)})


def resolve_pair_geometry(a, n_pad: int = 256, tm: int = 8, tk: int = 128,
                          reorder_rows: bool = True,
                          budget_bytes: int | None = None,
                          plan_bytes_cap: int | None = None,
                          chunk_strips: int | None = None):
    """Pick (row order, supertile rows, DMA chunk) for a pair plan.

    The serve-time model per (CH, ordering):

        steps·(step_us + CH·(strip_bytes/bw + strip_us)) [+ perm_us]

    where steps = Σ_pairs ceil(run/CH) + one filler chunk per empty
    supertile — every chunk DMAs and scatters a full CH strips (a pair's
    last chunk overreads into the next run, masked to trash), so larger
    CH amortizes grid-step overhead against overread traffic.  Stored
    plan bytes are CH-independent (exact strip occupancy).  Pass
    ``chunk_strips`` to pin CH instead of searching.  When even the
    smallest supertile cannot hold the full padded width, the output is
    width-tiled: the widest 128-multiple divisor of n_pad that admits a
    supertile wins (the plan re-streams once per width tile, so wider is
    cheaper).  Returns a PairGeometry or None when inadmissible.  Cached
    on the container; host-only."""
    from tpuspmm.engine.report import detect_chip
    from tpuspmm.kernels.dispatch import thresholds
    from tpuspmm.ops.xla import coo_view

    key = ("pair_geom", detect_chip(initialize=False), tm, tk,
           reorder_rows, n_pad, budget_bytes, plan_bytes_cap, chunk_strips)
    cache = _container_cache(a)
    if cache is not None and key in cache:
        return cache[key]

    coo = coo_view(a)
    m, k = coo.shape
    rows = np.asarray(coo.rows, np.int64)
    cols = np.asarray(coo.cols, np.int64)
    th = thresholds()
    ktile = cols // tk

    # on-disk geometry cache, shared with the panel resolver (see
    # panel_spmm): the search is determined by (matrix, key, chip
    # constants) — a serving restart must not replay it
    dkey = _geom_disk_key(a, key, th)
    status, entry = _geom_disk_load(dkey)
    if status == "hit":
        geom = "search"
        if entry is None:
            geom = None
        else:
            try:
                perm = (None if entry["order"] == "natural"
                        else _order_perm(rows, cols, m, ktile,
                                         entry["order"]))
                geom = PairGeometry(perm, int(entry["sm"]), int(entry["ch"]),
                                    int(entry["plan_bytes"]),
                                    int(entry["tile_n"]), entry["order"],
                                    entry.get("cost"))
            except Exception:
                geom = "search"  # malformed entry — redo the search
        if geom != "search":
            if cache is not None:
                cache[key] = geom
            return geom

    best, entries = _pair_search(
        *_pair_model_inputs(a, coo, rows, cols, m, k, n_pad, tm, tk,
                            reorder_rows, th),
        budget_bytes, plan_bytes_cap, chunk_strips)
    geom = (None if best is None
            else PairGeometry(best[1], best[3], best[4], best[2], best[5],
                              best[6], float(best[0])))
    _geom_disk_store(dkey, None if geom is None else {
        "sm": int(geom.sm), "ch": int(geom.chunk_strips),
        "plan_bytes": int(geom.plan_bytes), "tile_n": int(geom.tile_n),
        "order": geom.order_kind,
        "cost": None if geom.cost_us is None else float(geom.cost_us)})
    if cache is not None:
        cache[key] = geom
    return geom


def plan_values_bf16_exact_cached(a, rows, cols, vals, k: int) -> bool:
    """Container-cached wrapper over panel_spmm.plan_values_bf16_exact
    (the dedupe pass is O(nnz log nnz); geometry resolution calls it per
    (chip, width) key)."""
    from tpuspmm.kernels.panel_spmm import plan_values_bf16_exact

    cache = _container_cache(a)
    if cache is not None and "plan_vals_bf16" in cache:
        return cache["plan_vals_bf16"]
    exact = plan_values_bf16_exact(rows, cols, vals, k)
    if cache is not None:
        cache["plan_vals_bf16"] = exact
    return exact


def pair_plan_from_container(a, tm: int = 8, tk: int = 128,
                             chunk_strips: int = CHUNK_STRIPS,
                             sm: int | None = None,
                             reorder_rows: bool = True,
                             n_pad: int = 256,
                             geom=None) -> PairPlan:
    """Build (or fetch the cached) PairPlan.  ``geom`` (a PairGeometry)
    pins the row ordering/supertiling the caller already resolved —
    without it the unbudgeted resolver picks, and its permutation could
    differ from a budgeted resolution's."""
    if geom is None:
        geom = resolve_pair_geometry(a, n_pad=n_pad, tm=tm, tk=tk,
                                     reorder_rows=reorder_rows)
    if sm is None:
        m_pad = round_up(int(a.shape[0]), tm)
        sm = None if geom.sm == m_pad else geom.sm
    perm = geom.row_perm
    fp = None if perm is None else hash(np.asarray(perm).tobytes())
    key = ("pair", tm, tk, chunk_strips, sm, fp)
    cache = _container_cache(a)
    if cache is not None and key in cache:
        return cache[key]
    from tpuspmm.ops.xla import coo_view

    coo = coo_view(a)
    plan = build_pair_plan(
        np.asarray(coo.rows), np.asarray(coo.cols), np.asarray(coo.values),
        coo.shape, tm=tm, tk=tk, chunk_strips=chunk_strips, sm=sm,
        row_perm=perm)
    if cache is not None:
        cache[key] = plan
    return plan


def spmm_pair(a_or_plan, b, interpret=None,
              budget_bytes: int = 8 * 1024 * 1024,
              mode: str = "highest",
              tm: int = 8, tk: int = 128,
              chunk_strips: int | None = None,
              tile_n: int | None = None):
    """Container/plan-level entry for the run-length pair kernel.

    Same precision tiers as spmm_panel ("highest" gate-exact, "split2"
    verified-only); outputs larger than the VMEM budget are row
    supertiled, and widths whose slab cannot fit even one supertile are
    width-tiled (``tile_n`` pins that tile; auto otherwise).
    ``chunk_strips`` pins the DMA chunk size (the geometry resolver
    searches otherwise).  Prefer this kernel when panel padding or
    grid-step count dominates — the autotuner measures both and serves
    the winner.
    """
    mode = normalize_panel_mode(mode)
    n = int(b.shape[1])
    n_pad = round_up(n, 128)
    if isinstance(a_or_plan, PairPlan):
        plan = a_or_plan
    else:
        geom = resolve_pair_geometry(a_or_plan, n_pad, tm=tm, tk=tk,
                                     budget_bytes=budget_bytes,
                                     plan_bytes_cap=PLAN_BYTES_CAP,
                                     chunk_strips=chunk_strips)
        if geom is None:
            raise ValueError(
                f"no pair geometry admissible at width {n_pad}: either "
                "one output strip exceeds the VMEM residency budget or "
                "the plan exceeds PLAN_BYTES_CAP; use spmm_tiles")
        m_pad = round_up(int(a_or_plan.shape[0]), tm)
        plan = pair_plan_from_container(
            a_or_plan, tm=tm, tk=tk, chunk_strips=geom.chunk_strips,
            sm=None if geom.sm == m_pad else geom.sm, n_pad=n_pad,
            geom=geom)
        if tile_n is None:
            tile_n = geom.tile_n
    m, k = plan.shape
    interp = should_interpret(interpret)
    if tile_n is None:
        # explicit-plan path: widest 128-multiple divisor of n_pad whose
        # slab fits the budget at the plan's supertiling
        for t in (d * 128 for d in range(n_pad // 128, 0, -1)
                  if n_pad % (d * 128) == 0):
            if fits_vmem_pair(plan.sm, t, plan.tm, plan.tk,
                              budget_bytes, plan.chunk_strips):
                tile_n = t
                break
    if not interp and (tile_n is None or not fits_vmem_pair(
            plan.sm, tile_n, plan.tm, plan.tk, budget_bytes,
            plan.chunk_strips)):
        raise ValueError(
            f"output slab ({plan.sm}x{tile_n or n_pad}) exceeds the VMEM "
            "residency budget; rebuild the plan with a smaller sm or use "
            "spmm_tiles")
    k_pad = plan.num_k_tiles * plan.tk
    b_padded = pad_b(jnp.asarray(b), k_pad, n_pad)
    c_kt, c_st, c_start, c_count, offs, a_dense = plan.device_arrays()
    n_st = plan.n_supertiles
    out = _pair_spmm(
        c_kt, c_st, c_start, c_count, offs, a_dense, b_padded,
        tm=plan.tm, tk=plan.tk, chunk_strips=plan.chunk_strips,
        sm=plan.sm, n_st=n_st, interpret=interp, mode=mode,
        tile_n=None if tile_n == n_pad else tile_n)
    return finish_panel_output(out, plan, n_st, n_pad, m, n)
