"""Pallas pre-densified panel SpMM: plan-time block densification.

The fourth point in the VMEM-residency design space (tile_spmm streams
everything, csr_vmem pins B, cres_spmm pins C) and the round-2 answer to
the one-hot kernels' redundant MXU work: since the sparse operand is
static across serving calls, the (row-strip × k-tile) groups of nonzeros
can be densified ONCE at plan-build time into a stacked dense array, and
every SpMM call becomes a stream of ordinary dense panel matmuls:

    for each panel p (P strips of tm rows, all in k-tile kt[p]):
        acc = A_panel[p] @ B[kt[p]·tk : (kt[p]+1)·tk, :]      # MXU, dense
        for each strip i:  C[offs[p,i] : +tm, :] += acc_strip_i

versus the one-hot kernels (cres_spmm.py), which pay (TK+TM)·TN one-hot
MACs per *nonzero slot* to densify in-kernel: on the headline matrix
(large_25605) the panel plan does ~4.6 G MXU MACs where the chunked
one-hot plan does ~10.5 G, with zero VPU iota-compare work and no
gather→scale→scatter dependency chain.  The cost is HBM: the stacked
dense blocks (fill ~1-50%) are re-read every call, so admission requires
affordable plan bytes; hyper-scattered matrices (≲8 nnz per group) are
better served by the gather kernels and the autotuner sorts that out.

C stays VMEM-resident (same residency rule as cres_spmm) with one
extra trash strip at the bottom absorbing panel-padding writes; strip
offsets are multiples of tm (sublane-aligned — Mosaic lowers aligned
dynamic *slices*; it is per-element gathers it cannot lower).

Outputs larger than the VMEM budget are handled by **row supertiling**:
panels are grouped supertile-major (supertile, k-tile) and the output
block index follows a scalar-prefetched per-panel supertile id, so each
(sm+tm)-row output slab is visited by one contiguous run of panels,
zero-initialised when the slab changes, and flushed to HBM when the run
ends.  Each supertile carries its own local trash strip.  The cost is
one extra streaming pass over B per supertile.

This strategy replaces what the reference could not do at all: its BSR
path requires pre-blocked inputs with degenerate 1×1 blocks
(reference/utils/python_utils/convert_mtx.py:22) and its fromDense
throws (reference/src/formats/sparse_bsr.cu:254-295); here any format
self-blocks at plan time into MXU-shaped panels.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import operator
from typing import Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuspmm.kernels.common import (round_up, should_interpret, pad_b,
                                    split_bf16)

# admission cap on the stacked dense plan (re-read from HBM every call)
PLAN_BYTES_CAP = 512 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class PanelPlan:
    """Plan-time densification of a sparse matrix into MXU panels."""

    kt: np.ndarray       # (n_panels,) int32 — k-tile id per panel
    #                      (sorted within each supertile)
    st: np.ndarray       # (n_panels,) int32 — row-supertile id per panel
    #                      (sorted ascending; every supertile appears)
    offs: np.ndarray     # (n_panels, P) int32 — supertile-LOCAL C row
    #                      offset per strip; padding strips point at the
    #                      local trash strip (sm)
    a_dense: np.ndarray  # (n_panels · P · tm, tk) — stacked strips; f32,
    #                      or bf16 when every (deduped) value round-trips
    #                      bf16 LOSSLESSLY (±1 incidence matrices and other
    #                      low-precision patterns — halves the plan bytes
    #                      re-read from HBM every call with zero precision
    #                      change; see plan_values_bf16_exact)

    shape: Tuple[int, int]
    tm: int
    tk: int
    panel_strips: int  # P
    sm: int            # supertile rows (multiple of tm); == m_pad when
    #                    the whole output is one supertile
    row_perm: np.ndarray | None = None  # (m,) — original row placed at
    #                    permuted position j is row_perm[j]; the kernel
    #                    computes the permuted C, un-permuted on return.
    #                    Chosen at plan time to cluster rows sharing
    #                    k-tiles into octets (raises plan fill).

    @property
    def n_panels(self) -> int:
        return int(self.kt.shape[0])

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

    def device_arrays(self):
        """(kt, st, offs, a_dense) on device — transferred once, cached."""
        cached = getattr(self, "_device_arrays", None)
        if cached is None:
            cached = tuple(jnp.asarray(x) for x in
                           (self.kt, self.st, self.offs, self.a_dense))
            if any(isinstance(x, jax.core.Tracer) for x in cached):
                # first call happened under a trace: the converted values
                # are tracers scoped to that trace — caching them would
                # leak into later traces (UnexpectedTracerError)
                return cached
            object.__setattr__(self, "_device_arrays", cached)
        return cached


def _occupied_strip_groups(rows, ktile, nkt: int, tm: int):
    """Sorted unique (row-strip, k-tile) group ids — the nnz-sized pass of
    the strip histogram, independent of the supertiling so the geometry
    search computes it once per (row order, tm)."""
    return np.unique((rows // tm) * nkt + ktile)


def _st_strip_counts_from_groups(g, nkt: int, st_div: int):
    """Group the occupied strips per (supertile, k-tile) pair; operates on
    the (small) unique-group array, so re-evaluating per supertiling
    candidate is cheap."""
    st_g = (g // nkt) // st_div
    pair = st_g * nkt + (g % nkt)
    _, cnt = np.unique(pair, return_counts=True)
    return cnt, len(np.unique(st_g))


def _st_strip_counts(rows, ktile, nkt: int, tm: int, st_div: int):
    """Occupied-(supertile, k-tile) group histogram for a candidate row
    order — the unpadded strip counts build_panel_plan will pad to
    multiples of P, grouped exactly as the builder groups them
    (per (supertile, k-tile) pair, ``st_div`` = supertile rows / tm).
    Returns (per-pair counts, number of occupied supertiles)."""
    g = _occupied_strip_groups(rows, ktile, nkt, tm)
    return _st_strip_counts_from_groups(g, nkt, st_div)


def _padded_strips(cnt: np.ndarray, P: int) -> int:
    """Total strips after padding each k-tile's list to a multiple of P."""
    return int(((-(-cnt // P)) * P).sum())


# Named row-ordering kinds, index-aligned with _order_candidates' return
# (the geometry disk cache stores the winning KIND, not the m-sized
# permutation — one sort rebuilds it on a cache hit)
ORDER_KINDS = ("centroid", "first_centroid", "signature")


def _row_centroids(rows, cols, m: int):
    cent = np.zeros(m)
    num = np.zeros(m)
    np.add.at(cent, rows, cols)
    np.add.at(num, rows, 1)
    return np.where(num > 0, cent / np.maximum(num, 1), np.inf)


def _order_perm(rows, cols, m: int, ktile, kind: str, sig_depth: int = 4,
                cent=None):
    """Build ONE named candidate permutation (see _order_candidates for
    the kinds) — the geometry disk cache's reconstruction path."""
    if cent is None:
        cent = _row_centroids(rows, cols, m)
    if kind == "centroid":
        return np.argsort(cent, kind="stable")
    if kind == "first_centroid":
        first = np.full(m, np.inf)
        np.minimum.at(first, rows, ktile)
        return np.lexsort((cent, first))
    if kind != "signature":
        raise ValueError(f"unknown row-order kind {kind!r}")
    # signature keys: the d-th distinct k-tile of each row (BIG when the
    # row has fewer than d+1 distinct tiles, pushing short rows together)
    nk = int(ktile.max()) + 1 if len(ktile) else 1
    dd = np.unique(rows * np.int64(nk) + ktile)
    rr, kk = dd // nk, dd % nk
    starts = np.concatenate([[0], np.flatnonzero(np.diff(rr)) + 1])
    counts = np.diff(np.concatenate([starts, [len(rr)]]))
    BIG = np.int64(1) << 40
    keys = np.full((m, sig_depth), BIG, np.int64)
    urows = rr[starts]
    for d in range(sig_depth):
        sel = counts > d
        keys[urows[sel], d] = kk[starts[sel] + d]
    return np.lexsort((cent, *(keys[:, d] for d in
                               range(sig_depth - 1, -1, -1))))


def _order_candidates(rows, cols, m: int, ktile, sig_depth: int = 4):
    """Candidate row permutations — all cluster rows sharing k-tiles into
    the same octet so their nonzeros densify together: column-centroid
    sort, (first k-tile, centroid) lexsort, and a k-tile-SIGNATURE
    lexsort (each row keyed by its first ``sig_depth`` distinct k-tiles,
    centroid tiebreak).  The signature sort is the strongest clusterer on
    matrices whose rows span several k-tiles (measured on the corpus:
    cuts large_20000's padded strips 47% vs natural order and
    medium_4096's 17% vs the first+centroid sort) while the cheaper sorts
    win on single-tile-dominated structures; the geometry cost model
    picks per matrix."""
    cent = _row_centroids(rows, cols, m)
    return tuple(_order_perm(rows, cols, m, ktile, kind, sig_depth,
                             cent=cent)
                 for kind in ORDER_KINDS)


# P candidates for the auto geometry chooser; the kernel unrolls a
# P-iteration strip-scatter loop, so the list is kept short
STRIP_CANDIDATES = (8, 16, 32, 64)
# strip-height candidates for the joint (tm, P) search: the kernel's
# per-panel accumulate is a serial chain of P dynamic-slice RMWs of
# (tm, n_pad) each — larger tm cuts the chain length (the round-2
# headline's named 2x-to-floor bottleneck) at the cost of more padding
# inside each strip.  On incidence-structured matrices the permuted rows
# cluster so well that tm=32 adds ZERO plan bytes while running 4x fewer
# slice ops (large_25605: 12864 -> 3216 strips at identical 26.3 MB).
TM_CANDIDATES = (8, 16, 32)
# k-tile-width candidates for the joint search: doubling tk halves the
# number of k-tiles, so occupied (strip, k-tile) groups merge — fewer
# grid steps (amortizing the fixed per-step cost) and fewer strip RMWs —
# at the cost of wider, emptier strips (more plan bytes re-read per
# call).  Exact plan bytes per candidate keep the tradeoff honest; on
# the corpus tk=256 cuts steps 25-45% for +10-45% plan bytes, so the
# cost model picks it only where the step/strip terms dominate the
# bandwidth term (tk=512 additionally wins on k-scattered rows:
# large_21074 / medium_4096 / medium_2880 model 10-25% cheaper there).
TK_CANDIDATES = (128, 256, 512)


def _geometry_search(rows, cols, m: int, k: int, tm, tk: int,
                     candidates, *,
                     n_pad: int = 256,
                     budget_bytes: int | None = None,
                     plan_bytes_cap: int | None = None,
                     step_us: float = 0.17,
                     strip_us: float = 0.0,
                     hbm_gbps: float = 250.0,
                     perm_us: float = 0.0,
                     reorder: bool = True,
                     prefer: int = 16,
                     val_bytes: int = 4,
                     topk: int | None = None):
    """Joint (tm, P, row order, supertile rows) search minimising the
    modelled serve time

        n_strips·(strip_bytes/HBM_BW + strip_cost) + n_panels·step_cost
        [+ perm_cost if row-reordered]

    — the sides of the panel tradeoff: larger P cuts grid steps
    (wins for scattered matrices like large_21074, whose serve time is
    ~grid-step bound) but pads more strips per (supertile, k-tile) pair
    (loses for plan-bandwidth-bound matrices like large_25605); larger
    tm cuts the per-panel slice-RMW chain (strip_cost) but pads more
    rows into each strip; larger tk merges k-tiles — fewer grid steps
    and strip RMWs — but pads more columns into each strip.  Plan bytes
    are EXACT, not modelled: the strip histogram is computed per
    candidate (tm, tk, supertiling) with the same (supertile, k-tile)
    grouping and empty-supertile panels build_panel_plan produces, so a
    ``plan_bytes_cap`` (HBM-affordability admission) filters candidates
    truthfully and a VMEM ``budget_bytes`` (None = single supertile)
    charges the extra padding that supertiling causes.  A ≥3% modelled
    win is required to deviate from the natural order at
    (tm=first candidate, tk=first candidate, P=prefer) (falling back to
    the smallest admissible P when ``prefer`` is not admissible).
    ``tm`` and ``tk`` may each be an int (pinned) or a tuple of
    candidates.  Returns (P, row_perm, sm, plan_bytes, tm, order_kind,
    tk, modelled cost in µs) or None when no candidate passes
    admission.  With ``topk`` set, returns a LIST of up to topk such
    tuples — the distinct cheapest geometries, base-preferred winner
    first — for callers that measure candidates instead of trusting the
    model (the round-3 fit's residual RMS is ~0.12 ms on 0.06–1.0 ms
    serves, so the model's #2/#3 picks are within its noise)."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    tms = (tm,) if isinstance(tm, int) else tuple(tm)
    tks = (tk,) if isinstance(tk, int) else tuple(tk)
    bw = hbm_gbps * 1e3          # bytes per µs

    # (cost, P, perm, sm, plan_bytes, tm, order_kind, tk)
    entries = []
    for tk_c in tks:
        nkt = max(1, -(-k // tk_c))
        ktile = cols // tk_c

        # order candidates depend on ktile, so rebuild per tk candidate
        orders = [(None, rows)]
        order_kinds = ["natural"]
        if reorder and len(rows) and m > tms[0]:
            for kind, perm in zip(ORDER_KINDS,
                                  _order_candidates(rows, cols, m, ktile)):
                inv = np.empty(m, np.int64)
                inv[perm] = np.arange(m)
                orders.append((perm, inv[rows]))
                order_kinds.append(kind)

        for tm_c in tms:
            m_pad = round_up(max(m, tm_c), tm_c)
            # val_bytes=2 when the deduped values round-trip bf16 (the
            # plan will be stored compacted — see plan_values_bf16_exact)
            # so admission and the bandwidth term price the actual stream
            strip_bytes = tm_c * tk_c * val_bytes
            # the nnz-sized unique pass depends only on (order, tm, tk);
            # per-(P, supertiling) regroupings run on the small group
            # array
            groups = [_occupied_strip_groups(prows, ktile, nkt, tm_c)
                      for _, prows in orders]
            cnt_cache = {}
            for P in candidates:
                if budget_bytes is None:
                    sm = m_pad
                else:
                    sm = pick_supertile_rows(m_pad, n_pad, tm_c, tk_c,
                                             budget_bytes, panel_strips=P)
                    if sm is None:
                        continue
                st_div = max(1, sm // tm_c)
                n_st = max(1, -(-m_pad // sm))
                for oi, (perm, prows) in enumerate(orders):
                    key = (oi, st_div)
                    if key not in cnt_cache:
                        cnt_cache[key] = _st_strip_counts_from_groups(
                            groups[oi], nkt, st_div)
                    cnt, occ_st = cnt_cache[key]
                    s = _padded_strips(cnt, P) + (n_st - occ_st) * P
                    plan_bytes = s * strip_bytes
                    if (plan_bytes_cap is not None
                            and plan_bytes > plan_bytes_cap):
                        continue
                    cost = (s * (strip_bytes / bw + strip_us)
                            + (s // P) * step_us
                            + (perm_us if perm is not None else 0.0))
                    entries.append((cost, P, perm, sm, plan_bytes, tm_c,
                                    order_kinds[oi], tk_c))
    if not entries:
        return [] if topk is not None else None
    naturals = [e for e in entries
                if e[2] is None and e[5] == tms[0] and e[7] == tks[0]]
    base = next((e for e in naturals if e[1] == prefer), None)
    if base is None and naturals:
        base = naturals[0]  # smallest admissible P, natural order
    best = min(entries, key=lambda e: e[0])
    if base is not None and best[0] >= base[0] * 0.97:
        best = base

    def _tup(e):
        return (e[1], e[2], e[3], e[4], e[5], e[6], e[7], e[0])

    if topk is not None:
        # distinct geometries by CONTENT (P, sm, tm, order, tk), cheapest
        # first, with the base-preferred winner leading so candidate #0
        # is always what the plain search would have served
        seen, out = set(), []
        for e in [best] + sorted(entries, key=lambda e: e[0]):
            ident = (e[1], e[3], e[5], e[6], e[7])
            if ident in seen:
                continue
            seen.add(ident)
            out.append(_tup(e))
            if len(out) >= topk:
                break
        return out
    return _tup(best)


def choose_row_order(rows, cols, m: int, k: int, tm: int = 8,
                     tk: int = 128, P: int = 16,
                     perm_us: float = 0.0, hbm_gbps: float = 250.0):
    """Pick the candidate row ordering that minimises the modelled serve
    time at fixed P: rows sharing k-tiles clustered into the same octet
    densify together (fewer padded strips = fewer plan bytes and grid
    steps).  ``perm_us`` charges the serve-time cost of un-permuting C
    (an XLA row gather — ~300 GB/s effective on v5e, 0.107 ms for a
    20000×256 C), so an ordering only wins when its savings dominate the
    gather.  Measured on the corpus the natural order wins for
    incidence-structured matrices (large_25605) while first+centroid
    cuts medium_4096's plan 36% and serve time 31% (0.212→0.146 ms).
    Returns a permutation (original row at permuted position j is
    perm[j]) or None when no candidate wins by ≥3%."""
    rows = np.asarray(rows, np.int64)
    if len(rows) == 0 or m <= tm:
        return None
    g = _geometry_search(rows, cols, m, k, tm, tk, (P,),
                         hbm_gbps=hbm_gbps, perm_us=perm_us, prefer=P)
    return None if g is None else g[1]


def choose_panel_geometry(rows, cols, m: int, k: int, tm: int = 8,
                          tk: int = 128,
                          strip_candidates=STRIP_CANDIDATES,
                          step_us: float = 0.17,
                          strip_us: float = 0.0,
                          hbm_gbps: float = 250.0,
                          perm_us: float = 0.0):
    """Jointly pick (P, row_perm) for a single-supertile plan — the
    raw cost-model entry (see _geometry_search for the model; the
    container-level resolve_panel_geometry adds VMEM budgets, plan-byte
    caps and per-chip constants)."""
    rows = np.asarray(rows, np.int64)
    if len(rows) == 0 or m <= tm:
        return 16, None
    g = _geometry_search(rows, cols, m, k, tm, tk, strip_candidates,
                         step_us=step_us, strip_us=strip_us,
                         hbm_gbps=hbm_gbps, perm_us=perm_us)
    return (16, None) if g is None else (g[0], g[1])


def values_bf16_exact(vals) -> bool:
    """Do these f32 values round-trip bf16 losslessly?"""
    v = np.asarray(vals, np.float32)
    return bool(np.array_equal(v.astype(ml_dtypes.bfloat16)
                               .astype(np.float32), v))


def _dedupe_triplets(rows, cols, vals, k: int):
    """Collapse duplicate coordinates ONCE at plan time, summing in f64
    then rounding to f32 (COO duplicate-accumulate semantics,
    reference/src/spmm/coo/spmm_coo_k1.cu:24 — but deterministic and at
    higher fidelity than the reference's f32 atomic ordering).  After
    this every plan slot holds exactly one value, so bf16 storage is
    lossless iff these values round-trip bf16 — the SAME predicate
    plan_values_bf16_exact gives the geometry cost model, keeping
    admission and the built plan provably consistent."""
    if not len(rows):
        return rows, cols, vals
    key = rows * np.int64(k) + cols
    uniq, inv = np.unique(key, return_inverse=True)
    if len(uniq) == len(rows):
        return rows, cols, vals
    acc = np.zeros(len(uniq), np.float64)
    np.add.at(acc, inv, vals.astype(np.float64))
    return ((uniq // k).astype(np.int64), (uniq % k).astype(np.int64),
            acc.astype(np.float32))


def plan_values_bf16_exact(rows, cols, vals, k: int) -> bool:
    """EXACT predictor of whether a panel plan built from these triplets
    stores in bf16: build_panel_plan dedupes through _dedupe_triplets
    before scattering, so the plan's nonzero entries are precisely the
    deduped values (row permutations cannot change the value set)."""
    _, _, v = _dedupe_triplets(np.asarray(rows, np.int64),
                               np.asarray(cols, np.int64),
                               np.asarray(vals, np.float32), k)
    return values_bf16_exact(v)


def build_panel_plan(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: Tuple[int, int],
    tm: int = 8,
    tk: int = 128,
    panel_strips: int = 16,
    sm: int | None = None,
    row_perm: np.ndarray | None = None,
) -> PanelPlan:
    """Group triplets by (supertile, k-tile, row-strip), supertile-major
    then kt-major; densify each group into a (tm × tk) strip; pad each
    (supertile, k-tile)'s strip list to a multiple of P so every panel is
    a single (P·tm × tk) dense LHS.  ``sm`` (supertile rows, multiple of
    tm) defaults to the whole padded output — one supertile."""
    if tm % 8:
        raise ValueError("tm must be a multiple of 8 (sublane alignment)")
    P = panel_strips
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float32)
    m, k = shape
    if row_perm is not None:
        inv = np.empty(m, np.int64)
        inv[np.asarray(row_perm, np.int64)] = np.arange(m)
        rows = inv[rows]  # kernel computes the permuted C
    rows, cols, vals = _dedupe_triplets(rows, cols, vals, k)
    # one deduped value per plan slot → bf16 storage is lossless iff the
    # values round-trip (halves the serve-time plan stream on ±1
    # incidence matrices such as n4c6-b13 / ch7-6-b5 / GL7d25)
    store_bf16 = values_bf16_exact(vals)
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
    nrt = -(-m // tm)
    nkt = -(-k // tk)
    order = np.lexsort((rt, ktile, stile))  # supertile-, then kt-major
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
    n_groups = len(starts)

    if n_groups == 0:  # empty matrix: one all-trash panel per supertile
        kt_arr = np.zeros(n_st, np.int32)
        st_arr = np.arange(n_st, dtype=np.int32)
        offs = np.full((n_st, P), sm, np.int32)
        a_dense = np.zeros((n_st * P * tm, tk), ml_dtypes.bfloat16)
        return PanelPlan(kt=kt_arr, st=st_arr, offs=offs, a_dense=a_dense,
                         shape=tuple(shape), tm=tm, tk=tk, panel_strips=P,
                         sm=sm, row_perm=row_perm)

    # per-(supertile, k-tile) group counts, padded to multiples of P
    pair_key = g_st * nkt + g_kt
    pairs_unique, pair_counts = np.unique(pair_key, return_counts=True)
    padded = (-(-pair_counts // P)) * P
    pair_start = np.concatenate([[0], np.cumsum(padded)[:-1]])
    n_strips = int(padded.sum())
    n_panels = n_strips // P

    # strip slot per group: groups are (st, kt)-major sorted, so within a
    # (supertile, k-tile) pair they occupy consecutive ranks
    pair_index = np.searchsorted(pairs_unique, pair_key)
    first_of_pair = np.concatenate([[0], np.cumsum(pair_counts)[:-1]])
    rank_in_pair = np.arange(n_groups) - first_of_pair[pair_index]
    slot = (pair_start[pair_index] + rank_in_pair).astype(np.int64)

    kt_arr = np.repeat(pairs_unique % nkt, padded // P).astype(np.int32)
    st_arr = np.repeat(pairs_unique // nkt, padded // P).astype(np.int32)
    offs = np.full(n_strips, sm, np.int32)  # default: local trash strip
    offs[slot] = (g_rt * tm - g_st * sm).astype(np.int32)
    offs = offs.reshape(n_panels, P)

    # densify: scatter the (already deduped) triplets into their strips —
    # flat slots are unique, so this is a pure placement, and every plan
    # entry is bit-identical to a deduped value or zero
    g_sizes = np.diff(np.concatenate([starts, [len(rows)]]))
    trip_group = np.repeat(np.arange(n_groups), g_sizes)
    r_local = rows - g_rt[trip_group] * tm
    c_local = cols - g_kt[trip_group] * tk
    flat = (slot[trip_group] * tm + r_local) * tk + c_local
    a_dense = np.zeros(n_strips * tm * tk,
                       ml_dtypes.bfloat16 if store_bf16 else np.float32)
    a_dense[flat] = vals.astype(a_dense.dtype)
    a_dense = a_dense.reshape(n_strips * tm, tk)

    # every supertile must appear so its output slab gets zero-initialised
    # and flushed — append an all-trash panel for empty supertiles
    missing = np.setdiff1d(np.arange(n_st), st_arr)
    if len(missing):
        kt_arr = np.concatenate([kt_arr, np.zeros(len(missing), np.int32)])
        st_arr = np.concatenate([st_arr, missing.astype(np.int32)])
        offs = np.concatenate([offs, np.full((len(missing), P), sm,
                                             np.int32)])
        a_dense = np.concatenate(
            [a_dense, np.zeros((len(missing) * P * tm, tk), a_dense.dtype)])
        perm = np.lexsort((kt_arr, st_arr))
        kt_arr, st_arr, offs = kt_arr[perm], st_arr[perm], offs[perm]
        a_dense = a_dense.reshape(-1, P * tm, tk)[perm].reshape(-1, tk)

    return PanelPlan(kt=kt_arr, st=st_arr, offs=offs, a_dense=a_dense,
                     shape=tuple(shape), tm=tm, tk=tk, panel_strips=P,
                     sm=sm, row_perm=row_perm)


def _container_cache(a):
    cache = getattr(a, "_plan_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(a, "_plan_cache", cache)
        except Exception:
            cache = None
    return cache


# ---------------------------------------------------------------------------
# on-disk geometry cache: serving processes restart; the joint
# (tm, P, order, supertiling) search costs 60-110 ms per large matrix and
# is fully determined by (matrix, width, caps, chip), so replaying it
# every restart is pure waste.  Stored per matrix DIGEST; the winning row
# ORDER is stored by kind (one sort rebuilds the m-sized permutation),
# not as the permutation itself.
# ---------------------------------------------------------------------------

def _geom_disk_path() -> str:
    import os

    return os.environ.get(
        "TPUSPMM_GEOM_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tpuspmm",
                     "geom.json"))


def _geom_disk_load(key: str):
    """-> ("hit", entry-dict-or-None) | ("miss", None).  entry None means
    the search itself concluded "inadmissible" for these caps."""
    import json

    try:
        with open(_geom_disk_path()) as f:
            data = json.load(f)
    except Exception:
        return "miss", None
    if key not in data:
        return "miss", None
    return "hit", data[key]


def _geom_disk_store(key: str, entry) -> None:
    import json
    import os

    path = _geom_disk_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    data = json.load(f)
            except Exception:
                data = {}  # corrupted cache file — heal it by rewriting
                # (the atomic replace below makes the overwrite safe)
        data[key] = entry
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, path)  # atomic
    except Exception:
        pass  # best-effort


def _geom_disk_key(a, key: tuple, th: dict) -> str:
    """Shared disk-cache key for the panel/pair geometry resolvers: the
    search is determined by (matrix digest, resolver key, the chip's
    cost-model constants) — constants are embedded so a refit invalidates
    stored geometries.  One helper so a schema bump cannot go one-sided."""
    from tpuspmm.engine.autotune import matrix_digest

    th_fp = ":".join(f"{v:g}" if isinstance(v, float) else str(v)
                     for _, v in sorted(th.items()))
    return ("v1:" + matrix_digest(a) + ":" + ":".join(map(str, key))
            + ":" + th_fp)


PanelGeometry = collections.namedtuple(
    "PanelGeometry",
    "panel_strips row_perm sm plan_bytes tm order_kind tk cost_us",
    defaults=(8, "natural", 128, None))
# cost_us: the search's modelled serve time — comparable with a
# PairGeometry's (same constants/units), which is how the heuristic
# dispatch picks between the two kernel families without a measurement.


def _panel_model_kwargs(th: dict, m: int, k: int, n_pad: int,
                        budget_bytes, plan_bytes_cap, reorder_rows: bool,
                        rows, cols, values) -> dict:
    """Shared `_geometry_search` kwargs of the resolver and the
    candidate enumerator — one place so the two paths can never price a
    geometry differently.  perm_us is the serve-time charge for
    un-permuting a row-reordered C: read+write the actual m×n_pad output
    once through the measured effective row-gather bandwidth (below HBM
    peak — XLA lowers jnp.take on rows as a gather)."""
    perm_us = (m * n_pad * 4 * 2
               / (th.get("panel_gather_gbps", 300.0) * 1e3))
    return dict(
        n_pad=n_pad, budget_bytes=budget_bytes,
        plan_bytes_cap=plan_bytes_cap,
        step_us=th.get("panel_step_us", 0.17),
        strip_us=th.get("panel_strip_us", 0.0),
        hbm_gbps=th.get("panel_hbm_gbps", 250.0),
        perm_us=perm_us, reorder=reorder_rows,
        val_bytes=2 if plan_values_bf16_exact(rows, cols, values, k)
        else 4)


def resolve_panel_geometry_candidates(a, n_pad: int = 256, k: int = 3,
                                      panel_strips: int | None = None,
                                      reorder_rows: bool = True,
                                      budget_bytes: int | None = None,
                                      plan_bytes_cap: int | None = None):
    """The model's top-``k`` distinct panel geometries (cheapest modelled
    serve time first, the plain resolver's pick leading) — for callers
    that MEASURE the candidates and pin the winner
    (:func:`pin_panel_geometry`) instead of trusting a model whose fit
    residual is comparable to the spread between its top picks
    (results/panel_model_fit.json: RMS 0.123 ms).  Not disk-cached: the
    enumeration is a host-side search, cheap next to one on-chip
    measurement."""
    from tpuspmm.kernels.dispatch import thresholds
    from tpuspmm.ops.xla import coo_view

    coo = coo_view(a)
    m, kk = coo.shape
    rows = np.asarray(coo.rows)
    cols = np.asarray(coo.cols)
    th = thresholds()
    kwargs = _panel_model_kwargs(th, m, kk, n_pad, budget_bytes,
                                 plan_bytes_cap, reorder_rows,
                                 rows, cols, coo.values)
    strip_cands = ((panel_strips,) if panel_strips is not None
                   else STRIP_CANDIDATES)
    out = _geometry_search(rows, cols, m, kk, TM_CANDIDATES, TK_CANDIDATES,
                           strip_cands,
                           prefer=panel_strips if panel_strips is not None
                           else 16, topk=k, **kwargs)
    return [PanelGeometry(*g) for g in out]


def pin_panel_geometry(a, geom, n_pad: int = 256,
                       tm=None, tk=None,
                       panel_strips: int | None = None,
                       reorder_rows: bool = True,
                       budget_bytes: int | None = None,
                       plan_bytes_cap: int | None = None,
                       disk: bool = True) -> None:
    """Record ``geom`` as THE resolved panel geometry for these resolver
    args (container + disk cache), so every later
    :func:`resolve_panel_geometry` call — this process or a serving
    restart — returns it without re-searching.  The autotuner calls this
    after measuring the candidate geometries on chip: the measured
    winner must be what serving dispatches, not the model's guess
    (reference analogue: the record stream reflects the kernel actually
    dispatched, reference/src/engine/engine.cpp:36-55)."""
    from tpuspmm.engine.report import detect_chip
    from tpuspmm.kernels.dispatch import thresholds

    tm_arg = TM_CANDIDATES if tm is None else tm
    tk_arg = TK_CANDIDATES if tk is None else tk
    key = ("panel_geom", detect_chip(initialize=False), tm_arg, tk_arg,
           panel_strips, reorder_rows, n_pad, budget_bytes, plan_bytes_cap)
    cache = _container_cache(a)
    if cache is not None:
        cache[key] = geom
    if not disk:
        return  # transient (candidate-measurement) pin — this process only
    dkey = _geom_disk_key(a, key, thresholds())
    _geom_disk_store(dkey, None if geom is None else {
        "p": geom.panel_strips, "sm": int(geom.sm),
        "plan_bytes": int(geom.plan_bytes), "tm": int(geom.tm),
        "order": geom.order_kind, "tk": int(geom.tk),
        "cost": None if geom.cost_us is None else float(geom.cost_us)})


def resolve_panel_geometry(a, n_pad: int = 256, tm: int | None = None,
                           tk: int | None = None,
                           panel_strips: int | None = None,
                           reorder_rows: bool = True,
                           budget_bytes: int | None = None,
                           plan_bytes_cap: int | None = None):
    """Resolve the full panel geometry for a container: a PanelGeometry
    (P, row_perm, sm, exact plan_bytes, tm, order kind, tk), or None when
    no candidate fits the VMEM ``budget_bytes`` / ``plan_bytes_cap``
    admission.

    ``panel_strips=None`` (the default/auto mode) searches P candidates ×
    row orderings with the detected chip's constants; an explicit P pins
    the strip count (degrading to smaller candidates only when P itself
    is inadmissible).  ``tm=None`` (default) jointly searches the strip
    heights in TM_CANDIDATES — larger strips run fewer per-panel
    slice-RMW chain ops at the cost of in-strip padding; ``tk=None``
    jointly searches the k-tile widths in TK_CANDIDATES — wider tiles
    run fewer grid steps at the cost of in-strip padding; ints pin them.
    ``budget_bytes=None`` means a single supertile
    (no VMEM constraint).  The result is cached on the container — the
    search is a one-time plan cost.  Host-only: never initializes the
    JAX backend (thresholds() falls back to defaults pre-init)."""
    from tpuspmm.engine.report import detect_chip
    from tpuspmm.kernels.dispatch import thresholds
    from tpuspmm.ops.xla import coo_view

    # the chip is part of the key: a geometry resolved pre-backend-init
    # (detect_chip falls back to "cpu") must not pin "cpu"-row constants
    # for the container's lifetime once the real chip is known
    tm_arg = TM_CANDIDATES if tm is None else tm
    tk_arg = TK_CANDIDATES if tk is None else tk
    key = ("panel_geom", detect_chip(initialize=False), tm_arg, tk_arg,
           panel_strips, reorder_rows, n_pad, budget_bytes, plan_bytes_cap)
    cache = _container_cache(a)
    if cache is not None and key in cache:
        return cache[key]

    coo = coo_view(a)
    m, k = coo.shape
    rows = np.asarray(coo.rows)
    cols = np.asarray(coo.cols)

    th = thresholds()
    dkey = _geom_disk_key(a, key, th)
    status, entry = _geom_disk_load(dkey)
    if status == "hit":
        if entry is None:
            geom = None
        else:
            try:
                # the winning order's keys were computed at the winning
                # tk's tiling — rebuild with THAT tk, not the arg
                e_tk = int(entry.get("tk", 128))
                perm = (None if entry["order"] == "natural"
                        else _order_perm(rows.astype(np.int64),
                                         cols.astype(np.int64), m,
                                         cols.astype(np.int64) // e_tk,
                                         entry["order"]))
                geom = PanelGeometry(int(entry["p"]), perm, int(entry["sm"]),
                                     int(entry["plan_bytes"]),
                                     int(entry["tm"]), entry["order"], e_tk,
                                     entry.get("cost"))
            except Exception:
                geom = "search"  # malformed entry — redo the search
        if geom != "search":
            if cache is not None:
                cache[key] = geom
            return geom

    kwargs = _panel_model_kwargs(th, m, k, n_pad, budget_bytes,
                                 plan_bytes_cap, reorder_rows,
                                 rows, cols, coo.values)
    if panel_strips is not None:
        g = _geometry_search(rows, cols, m, k, tm_arg, tk_arg,
                             (panel_strips,),
                             prefer=panel_strips, **kwargs)
        if g is None:  # pinned P inadmissible — degrade, don't refuse
            smaller = tuple(c for c in STRIP_CANDIDATES
                            if c < panel_strips)
            if smaller:
                g = _geometry_search(rows, cols, m, k, tm_arg, tk_arg,
                                     smaller, prefer=smaller[0], **kwargs)
    else:
        g = _geometry_search(rows, cols, m, k, tm_arg, tk_arg,
                             STRIP_CANDIDATES, prefer=16, **kwargs)
    geom = None if g is None else PanelGeometry(*g)
    _geom_disk_store(dkey, None if geom is None else {
        "p": geom.panel_strips, "sm": int(geom.sm),
        "plan_bytes": int(geom.plan_bytes), "tm": int(geom.tm),
        "order": geom.order_kind, "tk": int(geom.tk),
        "cost": None if geom.cost_us is None else float(geom.cost_us)})
    if cache is not None:
        cache[key] = geom
    return geom


def resolve_panel_strips(a, tm: int = 8, tk: int = 128,
                         panel_strips: int | None = None,
                         reorder_rows: bool = True):
    """(P, row_perm) for a single-supertile plan — thin wrapper over
    :func:`resolve_panel_geometry` kept for the geometry-only callers."""
    g = resolve_panel_geometry(a, tm=tm, tk=tk, panel_strips=panel_strips,
                               reorder_rows=reorder_rows)
    return g.panel_strips, g.row_perm


def panel_plan_from_geometry(a, geom: PanelGeometry, tm: int | None = None,
                             tk: int | None = None) -> PanelPlan:
    """Build (or fetch the cached) PanelPlan for a resolved geometry —
    serving steady state pays the densification and H2D transfer once.
    The cache key is the geometry CONTENT (tm, tk, P, sm, permutation
    bytes), so two resolution paths that land on the same geometry share
    one plan and two that differ never collide.  ``tm=None`` / ``tk=None``
    (default) take the strip height / k-tile width the geometry search
    picked."""
    tm = geom.tm if tm is None else tm
    tk = geom.tk if tk is None else tk
    perm = geom.row_perm
    m_pad = round_up(int(a.shape[0]), tm)
    sm = geom.sm if geom.sm != m_pad else None
    fp = None if perm is None else hash(np.asarray(perm).tobytes())
    key = ("panel", tm, tk, geom.panel_strips, sm, fp)
    cache = _container_cache(a)
    if cache is not None and key in cache:
        return cache[key]
    from tpuspmm.ops.xla import coo_view

    coo = coo_view(a)
    plan = build_panel_plan(
        np.asarray(coo.rows), np.asarray(coo.cols),
        np.asarray(coo.values),
        coo.shape, tm=tm, tk=tk, panel_strips=geom.panel_strips, sm=sm,
        row_perm=perm)
    if cache is not None:
        cache[key] = plan
    return plan


def panel_plan_from_container(a, tm: int | None = None,
                              tk: int | None = None,
                              panel_strips: int | None = None,
                              sm: int | None = None,
                              reorder_rows: bool = True,
                              n_pad: int = 256) -> PanelPlan:
    """Resolve geometry and build (or fetch) the PanelPlan in one step.
    ``panel_strips=None`` auto-picks P per matrix (cost model);
    ``tm=None`` auto-picks the strip height; with ``reorder_rows``
    (default), candidate row orderings are evaluated and the winner is
    baked in (deterministic; the kernel output is un-permuted on
    return).  An explicit ``sm`` overrides the resolved supertiling
    (callers that already ran VMEM admission)."""
    geom = resolve_panel_geometry(a, n_pad=n_pad, tm=tm, tk=tk,
                                  panel_strips=panel_strips,
                                  reorder_rows=reorder_rows)
    if sm is not None:
        if sm % geom.tm:
            # caller pinned a supertile the searched strip height cannot
            # divide — re-resolve at the universally-compatible tm=8
            geom = resolve_panel_geometry(a, n_pad=n_pad, tm=8, tk=tk,
                                          panel_strips=panel_strips,
                                          reorder_rows=reorder_rows)
        geom = geom._replace(sm=sm)
    return panel_plan_from_geometry(a, geom, tk=tk)


def fits_vmem_panel(m_pad: int, n_pad: int, tm: int, tk: int,
                    budget_bytes: int = 8 * 1024 * 1024,
                    panel_strips: int = 16) -> bool:
    out_bytes = (m_pad + tm) * n_pad * 4
    panel_bytes = 2 * (panel_strips * tm) * tk * 4  # double-buffered A panel
    b_bytes = 2 * tk * n_pad * 4                    # double-buffered B tile
    acc_bytes = panel_strips * tm * n_pad * 4       # in-kernel acc stack
    return out_bytes + panel_bytes + b_bytes + acc_bytes <= budget_bytes


def pick_supertile_rows(m_pad: int, n_pad: int, tm: int, tk: int,
                        budget_bytes: int = 8 * 1024 * 1024,
                        panel_strips: int = 16) -> int | None:
    """Largest supertile row count (multiple of tm) whose output slab +
    streaming buffers fit the VMEM budget; m_pad when the whole output
    fits (single supertile); None when even one strip does not fit.

    The supertiled output slab is double-buffered by the Mosaic pipeline
    (its block index changes across the grid), so the budget convention
    — out counted once against half of physical VMEM, stream buffers
    counted at their doubled size — must also reserve a stack/scratch
    margin or a maximal slab lands within kilobytes of the 16 MiB scoped
    limit and large-P panel buffers push it over (seen on large_20000 at
    P=64: 16.6M > 16M)."""
    if fits_vmem_panel(m_pad, n_pad, tm, tk, budget_bytes, panel_strips):
        return m_pad
    panel_bytes = 2 * (panel_strips * tm) * tk * 4
    b_bytes = 2 * tk * n_pad * 4
    acc_bytes = panel_strips * tm * n_pad * 4
    margin = min(256 * 1024, budget_bytes // 8)
    avail = budget_bytes - panel_bytes - b_bytes - acc_bytes - margin
    sm = (avail // (n_pad * 4) - tm) // tm * tm
    if sm < tm:
        return None
    return min(sm, m_pad)


def admit_panel(a, n_pad: int, tm: int | None = None,
                tk: int | None = None,
                panel_strips: int | None = None,
                budget_bytes: int = 8 * 1024 * 1024):
    """Budget-constrained geometry admission for a container — thin
    wrapper over :func:`resolve_panel_geometry` (which searches only
    candidates whose double-buffered panel leaves room for at least one
    output strip, degrading P under tight budgets).  Returns
    ``(strips_arg, sm_arg)`` (``sm_arg`` None = single supertile), or
    ``None`` when inadmissible at any P."""
    g = resolve_panel_geometry(a, n_pad=n_pad, tm=tm, tk=tk,
                               panel_strips=panel_strips,
                               budget_bytes=budget_bytes)
    if g is None:
        return None
    m_pad = round_up(int(a.shape[0]), g.tm)
    return g.panel_strips, (None if g.sm == m_pad else g.sm)


def normalize_panel_mode(mode: str) -> str:
    """Translate the panel family's PUBLIC tier names to the internal
    ones used by panel_matmul.

    The family has two tiers: ``"highest"`` (gate-exact) and ``"split2"``
    (2-term-class bf16 splits, ~2^-16 residual, verified-only) — the same
    fidelity classes as the cres kernel's tiers of those names.  The
    tile/cres/staged kernels ALSO accept ``"split"`` for their robust
    3-term tier (~2^-26); a caller forwarding ``config.precision_mode=
    "split"`` into the panel family would expect that robust tier but
    silently get the weaker one, so ``"split"`` is rejected here
    (advisor finding, round 2)."""
    if mode == "split2":
        return "split"  # internal name of the 2-term-class tier
    if mode == "highest":
        return mode
    raise ValueError(
        f"panel-family mode must be 'highest' or 'split2', got {mode!r}. "
        "('split' means the robust 3-term tier in the tile/cres/staged "
        "kernels but the 2-term verified-only tier here — pass 'split2' "
        "if that weaker tier is what you want.)")


def panel_matmul(a_panel, b_tile, mode: str):
    """The shared precision-tier matmul of the panel-family kernels:
    pick the cheapest MXU-pass ladder that preserves the requested
    fidelity tier given the operand dtypes.

    - a bf16 (lossless store) & b bf16: one exact pass.
    - a bf16, b f32: split only B — 3 bf16 terms ≈ gate-exact (~2^-24,
      beyond f32 summation rounding) at HALF the passes of f32 HIGHEST;
      2 terms (~2^-16) for the verified-only "split" tier.
    - a f32, mode "split": hi·hi + lo·hi + hi·lo (dropped lo·lo ~2^-16 —
      same fidelity class as the cres split2 variant, verified-only);
      with exact-bf16 B only A splits (2 passes).
    - a f32, b bf16: 3-term split of the static A (~2^-26), B exact.
    - a f32, b f32, mode "highest": one dense f32 matmul at HIGHEST —
      full f32 fidelity, the accuracy class of the verification gate."""
    def _dot(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    a_exact = a_panel.dtype == jnp.bfloat16   # lossless by construction
    b_exact = b_tile.dtype == jnp.bfloat16    # caller ingested bf16
    if a_exact and b_exact:
        return _dot(a_panel, b_tile)
    if a_exact:
        parts = split_bf16(b_tile, 2 if mode == "split" else 3)
        return functools.reduce(operator.add,
                                [_dot(a_panel, p) for p in parts])
    if mode == "split":
        a_hi, a_lo = split_bf16(a_panel, 2)
        if b_exact:
            return _dot(a_hi, b_tile) + _dot(a_lo, b_tile)
        b_hi, b_lo = split_bf16(b_tile, 2)
        return _dot(a_hi, b_hi) + _dot(a_lo, b_hi) + _dot(a_hi, b_lo)
    if b_exact:
        parts = split_bf16(a_panel, 3)
        return functools.reduce(operator.add,
                                [_dot(p, b_tile) for p in parts])
    return jnp.dot(a_panel, b_tile, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _kernel(kt_ref, offs_ref, st_ref, a_ref, b_ref, out_ref, *, tm, P, mode,
            flat_offs):
    p = pl.program_id(0)

    # zero-init each output slab on its first panel (panels are sorted
    # supertile-major, so each slab is one contiguous run of grid steps)
    first = jnp.logical_or(
        p == 0, st_ref[p] != st_ref[jnp.maximum(p - 1, 0)])

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    acc = panel_matmul(a_ref[...], b_ref[...], mode)
    for i in range(P):
        # offsets are multiples of tm (tm % 8 == 0 enforced at plan build);
        # Mosaic needs the alignment hint to lower the dynamic slice.
        # offs layout: 2-D (n_panels, P) keeps the P scalar loads on one
        # SMEM row, but SMEM pads the trailing dim to 128 lanes (a
        # 128/P× blow-up that overflows its 1 MiB on huge plans) — the
        # caller switches to a flat 1-D layout past the SMEM cap
        idx = offs_ref[p * P + i] if flat_offs else offs_ref[p, i]
        off = pl.multiple_of(idx, tm)
        out_ref[pl.ds(off, tm), :] += acc[i * tm:(i + 1) * tm, :]


@functools.partial(
    jax.jit,
    static_argnames=("tm", "tk", "panel_strips", "sm", "n_st",
                     "interpret", "mode", "flat_offs"),
)
def _panel_spmm(kt, st, offs, a_dense, b_padded,
                *, tm, tk, panel_strips, sm, n_st, interpret,
                mode="highest", flat_offs=None):
    P = panel_strips
    n_pad = b_padded.shape[1]
    n_panels = kt.shape[0]
    # prefetched SMEM operands pad the trailing dim to 128 lanes: the 2-D
    # offs layout costs n_panels·512 B of SMEM regardless of P.  Keep it
    # (row-local scalar loads — measured ~3× faster than the flat layout
    # on grid-step-bound plans) while it fits under the 1 MiB SMEM
    # alongside kt/st; fall back to the flat layout for huge panel counts.
    # ``flat_offs=None`` auto-picks; tests pin it to exercise both layouts.
    if flat_offs is None:
        flat_offs = n_panels * 128 * 4 > 896 * 1024

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # kt (per panel), offs (per strip), st
        grid=(n_panels,),
        in_specs=[
            pl.BlockSpec((P * tm, tk),
                         lambda p, kt_ref, offs_ref, st_ref: (p, 0)),
            # panels are kt-sorted within a supertile → each B tile is
            # fetched once per supertile
            pl.BlockSpec((tk, n_pad),
                         lambda p, kt_ref, offs_ref, st_ref:
                         (kt_ref[p], 0)),
        ],
        # output slab revisited by the panel run of its supertile
        out_specs=pl.BlockSpec((sm + tm, n_pad),
                               lambda p, kt_ref, offs_ref, st_ref:
                               (st_ref[p], 0)),
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
    flops = 2 * n_panels * P * tm * tk * n_pad * passes // 6
    bytes_accessed = (a_dense.size * a_dense.dtype.itemsize
                      + n_panels * tk * n_pad * b_padded.dtype.itemsize
                      + n_st * (sm + tm) * n_pad * 4)
    out = pl.pallas_call(
        functools.partial(_kernel, tm=tm, P=P, mode=mode,
                          flat_offs=flat_offs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_st * (sm + tm), n_pad),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(kt, offs.reshape(-1) if flat_offs else offs, st, a_dense, b_padded)
    return out


def spmm_panel(a_or_plan, b, interpret=None,
               budget_bytes: int = 8 * 1024 * 1024,
               mode: str = "highest",
               tm: int | None = None, tk: int | None = None,
               panel_strips: int | None = None):
    """Container/plan-level entry for the pre-densified panel kernel.

    ``mode``: "highest" (gate-exact — the default) or "split2"
    (~2^-16 residual — verified-only tier).  When the plan stores bf16
    losslessly (plan_values_bf16_exact; ±1 incidence matrices), "highest"
    serves a 3-term bf16 split of B — the same gate-exact fidelity class
    at half the plan HBM bytes and half the MXU passes of the f32
    HIGHEST matmul used for f32 plans.
    ``panel_strips=None`` auto-picks P per matrix (cost model).

    Outputs larger than the VMEM budget are row-supertiled (the plan is
    rebuilt supertile-major); only an output narrower than one strip's
    worth of budget is refused.
    """
    mode = normalize_panel_mode(mode)
    n = int(b.shape[1])
    n_pad = round_up(n, 128)
    if isinstance(a_or_plan, PanelPlan):
        plan = a_or_plan
    else:
        geom = resolve_panel_geometry(a_or_plan, n_pad, tm=tm, tk=tk,
                                      panel_strips=panel_strips,
                                      budget_bytes=budget_bytes,
                                      plan_bytes_cap=PLAN_BYTES_CAP)
        if geom is None:
            raise ValueError(
                f"no panel geometry admissible at width {n_pad}: either "
                "one output strip exceeds the VMEM residency budget or "
                "every candidate plan exceeds PLAN_BYTES_CAP; use "
                "spmm_tiles")
        plan = panel_plan_from_geometry(a_or_plan, geom, tk=tk)
    m, k = plan.shape
    interp = should_interpret(interpret)
    # interpret mode has no VMEM to respect — CPU test callers with large
    # prebuilt single-supertile plans must not be refused (parity with
    # spmm_pair's guard; advisor finding r2)
    if not interp and not fits_vmem_panel(plan.sm, n_pad, plan.tm, plan.tk,
                                          budget_bytes, plan.panel_strips):
        raise ValueError(
            f"output slab ({plan.sm}x{n_pad}) exceeds the VMEM residency "
            "budget; rebuild the plan with a smaller sm or use spmm_tiles")
    k_pad = plan.num_k_tiles * plan.tk
    b_padded = pad_b(jnp.asarray(b), k_pad, n_pad)
    kt, st, offs, a_dense = plan.device_arrays()
    n_st = plan.n_supertiles
    out = _panel_spmm(
        kt, st, offs, a_dense, b_padded,
        tm=plan.tm, tk=plan.tk, panel_strips=plan.panel_strips,
        sm=plan.sm, n_st=n_st, interpret=interp,
        mode=mode)
    return finish_panel_output(out, plan, n_st, n_pad, m, n)


def finish_panel_output(out, plan, n_st: int, n_pad: int, m: int, n: int):
    """Shared epilogue of the panel-family kernels: strip each
    supertile's local trash strip, then restore the original row order
    when the plan was built over a row permutation (one XLA gather —
    reads+writes C once, ~0.1 ms for a 20000-row C on v5e, repaid by the
    plan savings the ordering buys; the geometry chooser charged this
    cost up front)."""
    if n_st > 1:
        out = out.reshape(n_st, plan.sm + plan.tm, n_pad)[:, :plan.sm, :]
        out = out.reshape(n_st * plan.sm, n_pad)
    if plan.row_perm is not None:
        inv = getattr(plan, "_inv_dev", None)
        if inv is None:
            inv = jnp.asarray(np.argsort(np.asarray(plan.row_perm)))
            if not isinstance(inv, jax.core.Tracer):
                object.__setattr__(plan, "_inv_dev", inv)
        return jnp.take(out, inv, axis=0)[:, :n]
    return out[:m, :n]
