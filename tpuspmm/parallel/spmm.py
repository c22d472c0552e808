"""Distributed SpMM schedules over a device mesh.

Schedules, in increasing communication sophistication:

- ``spmm_row_sharded`` — A row-sharded over ``"rows"``, B replicated.
  Zero collectives in the forward pass; each chip runs the single-chip
  Pallas tile kernel (or the XLA segment-sum path) on its slab.  This is
  the weak-scaling workhorse: nnz/s should scale ~linearly with chips.

- ``spmm_2d`` — A row-sharded over ``"rows"``, B column-sharded over
  ``"cols"`` (replicated over ``"rows"``).  Output is sharded over both
  axes.  Still collective-free; HBM per chip drops by the mesh area.

- ``spmm_ring`` — A row-sharded AND k-bucketed, B row(K)-sharded: no chip
  ever holds all of B.  B panels stream around the ``"rows"`` ring via
  ``ppermute`` while each chip multiplies the bucket matching the panel it
  currently holds — the halo/panel-all-gather-overlapped-with-compute
  design from BASELINE.json.  XLA schedules the ppermute concurrently with
  the bucket compute (the send uses only the incoming panel, not the
  accumulator).

The reference has no distributed execution at all (SURVEY.md §0, §2.4:
single hard-coded GPU at reference/src/main.cu:176); these are new-build
capabilities, designed mesh-first rather than ported.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuspmm.kernels.common import round_up, should_interpret
from tpuspmm.ops.xla import spmm_triplets
from tpuspmm.parallel.shard import (
    RowShardedPlan,
    RowShardedPanelPlan,
    RowShardedPairPlan,
    KBucketedTriplets,
    KBucketedTilePlans,
    KBucketedPanelPlans,
    KBucketedPairPlans,
    shard_rows_tileplan,
    shard_rows_panelplan,
    shard_rows_pairplan,
    bucket_triplets,
    bucket_tileplans,
    bucket_panelplans,
    bucket_pairplans,
    pad_dense_rows,
)


def _put(mesh: Mesh, x, spec: P):
    return jax.device_put(x, NamedSharding(mesh, spec))


def _divisor_tile_n(n_local: int, cap: int = 1024) -> int:
    """Largest output-column tile that divides the per-device width (which
    is always a multiple of 128) — a non-divisor silently leaves columns
    beyond the last full tile unwritten."""
    if n_local % 128 != 0:
        raise ValueError(f"per-device width {n_local} must be a multiple of 128")
    if n_local <= cap:
        return n_local
    for t in (1024, 512, 384, 256, 128):
        if n_local % t == 0:
            return t
    return 128  # unreachable: 128 always divides a multiple of 128


@functools.lru_cache(maxsize=64)
def _row_sharded_callable(mesh, axis, local, m_local, **static):
    """Build (once per mesh/geometry) the jitted shard_map for
    spmm_row_sharded — rebuilding it per call forces a full retrace."""

    def local_fn(rt, kt, first, rows, cols, vals, b_pad):
        from tpuspmm.kernels.tile_spmm import _tile_spmm

        if local == "tile":
            out = _tile_spmm(rt[0], kt[0], first[0], rows[0], cols[0], vals[0],
                             b_pad, **static)
        else:
            offs = rt[0].astype(jnp.int32) * static["tm"]
            kofs = kt[0].astype(jnp.int32) * static["tk"]
            gr = jnp.where(rows[0] < 0, -1, rows[0] + offs[:, None]).reshape(-1)
            gc = (cols[0] + kofs[:, None]).reshape(-1)
            out = spmm_triplets(gr, gc, vals[0].reshape(-1), b_pad,
                                num_rows=m_local)
        return out[:m_local]

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis), check_vma=False,
    ))


# ---------------------------------------------------------------------------
# row-sharded, B replicated
# ---------------------------------------------------------------------------

def spmm_row_sharded(a, b, mesh: Mesh, axis: str = "rows",
                     local: str = "tile", plan: Optional[RowShardedPlan] = None,
                     interpret=None):
    """C = A @ B with A row-sharded over ``axis`` and B replicated.

    ``local`` selects the per-chip kernel: "tile" = Pallas tile-sparse MXU
    kernel, "panel" = plan-time-densified panel kernel (the single-chip
    flagship, supertiled per slab), "pair" = run-length pair kernel
    (zero stored-plan padding), "xla" = gather + segment-sum.
    """
    if local == "panel":
        return _spmm_row_sharded_panel(a, b, mesh, axis, plan, interpret)
    if local == "pair":
        return _spmm_row_sharded_pair(a, b, mesh, axis, plan, interpret)
    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    if plan is None:
        plan = shard_rows_tileplan(a, n_dev)
    m, k = plan.shape
    n = int(np.shape(b)[1])
    n_pad = round_up(n, 128)
    tile_n = _divisor_tile_n(n_pad)
    k_pad = plan.num_k_tiles * plan.tile_k
    # pad on device — a host round trip per call would re-transfer the
    # largest operand through the tunnel on every serve
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plan.rt, P(axis)), shard(plan.kt, P(axis)), shard(plan.first, P(axis)),
        shard(plan.rows, P(axis)), shard(plan.cols, P(axis)), shard(plan.vals, P(axis)),
        shard(b_padded, P()),
    )

    fn = _row_sharded_callable(
        mesh, axis, local, plan.m_local,
        tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
        num_row_tiles=plan.num_row_tiles, num_k_tiles=plan.num_k_tiles,
        tile_n=tile_n, interpret=interp)
    out = fn(*args)
    return out[:m, :n]


def _cached_panel_shard_plan(a, n_dev, sm, tm=8, tk=128,
                             panel_strips=16) -> RowShardedPanelPlan:
    return _cached_plan(
        a, ("panel_shard", n_dev, sm, tm, tk, panel_strips),
        lambda: shard_rows_panelplan(a, n_dev, tm=tm, tk=tk,
                                     panel_strips=panel_strips, sm=sm))


@functools.lru_cache(maxsize=64)
def _row_sharded_panel_callable(mesh, axis, m_local, **static):
    from tpuspmm.kernels.panel_spmm import _panel_spmm

    n_st = static["n_st"]
    sm = static["sm"]
    tm = static["tm"]

    def local_fn(kt, st, offs, a_dense, b_pad):
        out = _panel_spmm(kt, st, offs, a_dense, b_pad, **static)
        if n_st > 1:
            n_pad = out.shape[1]
            out = out.reshape(n_st, sm + tm, n_pad)[:, :sm, :]
            out = out.reshape(n_st * sm, n_pad)
        return out[:m_local]

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis), check_vma=False,
    ))


def _spmm_row_sharded_panel(a, b, mesh: Mesh, axis: str,
                            plan: Optional[RowShardedPanelPlan],
                            interpret):
    """Row-sharded schedule serving the panel kernel per slab: the
    single-chip flagship at mesh scale, still collective-free in the
    forward pass."""
    from tpuspmm.kernels import panel_spmm

    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    n = int(np.shape(b)[1])
    n_pad = round_up(n, 128)
    if plan is None:
        m_local_guess = round_up(-(-a.shape[0] // n_dev), 8)
        sm = panel_spmm.pick_supertile_rows(m_local_guess, n_pad, 8, 128)
        if sm is None:
            raise ValueError(
                f"per-shard output ({m_local_guess}x{n_pad}) narrower than "
                "one strip of VMEM budget; use local='tile'")
        plan = _cached_panel_shard_plan(
            a, n_dev, None if sm >= m_local_guess else sm)
    m, k = plan.shape
    # an explicit plan must pass the same VMEM admission the plan=None
    # path performs — fail with a clear message instead of a Mosaic
    # scoped-memory compile error (interpret mode has no VMEM to respect)
    if not interp and not panel_spmm.fits_vmem_panel(
            plan.sm, n_pad, plan.tm, plan.tk,
            panel_strips=plan.panel_strips):
        raise ValueError(
            f"per-shard output slab ({plan.sm}x{n_pad}) exceeds the VMEM "
            "residency budget; rebuild the shard plan with sm from "
            "pick_supertile_rows, or pass plan=None to auto-supertile")
    k_pad = round_up(k, plan.tk)
    # pad on device — a host round trip per call would re-transfer the
    # largest operand through the tunnel on every serve
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plan.kt, P(axis)), shard(plan.st, P(axis)),
        shard(plan.offs, P(axis)), shard(plan.a_dense, P(axis)),
        shard(b_padded, P()),
    )
    fn = _row_sharded_panel_callable(
        mesh, axis, plan.m_local,
        tm=plan.tm, tk=plan.tk, panel_strips=plan.panel_strips,
        sm=plan.sm, n_st=plan.n_supertiles, interpret=interp)
    out = fn(*args)
    return out[:m, :n]


def _cached_pair_shard_plan(a, n_dev, sm, tm=8, tk=128,
                            chunk_strips=32) -> RowShardedPairPlan:
    return _cached_plan(
        a, ("pair_shard", n_dev, sm, tm, tk, chunk_strips),
        lambda: shard_rows_pairplan(a, n_dev, tm=tm, tk=tk,
                                    chunk_strips=chunk_strips, sm=sm))


@functools.lru_cache(maxsize=64)
def _row_sharded_pair_callable(mesh, axis, m_local, **static):
    from tpuspmm.kernels.pair_spmm import _pair_spmm

    n_st = static["n_st"]
    sm = static["sm"]
    tm = static["tm"]

    def local_fn(c_kt, c_st, c_start, c_count, offs, a_dense, b_pad):
        out = _pair_spmm(c_kt, c_st, c_start, c_count, offs, a_dense, b_pad,
                         **static)
        if n_st > 1:
            n_pad = out.shape[1]
            out = out.reshape(n_st, sm + tm, n_pad)[:, :sm, :]
            out = out.reshape(n_st * sm, n_pad)
        return out[:m_local]

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis), check_vma=False,
    ))


def _spmm_row_sharded_pair(a, b, mesh: Mesh, axis: str,
                           plan: Optional[RowShardedPairPlan],
                           interpret):
    """Row-sharded schedule serving the run-length pair kernel per slab —
    the zero-plan-padding flagship at mesh scale, collective-free in the
    forward pass."""
    from tpuspmm.kernels import pair_spmm

    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    n = int(np.shape(b)[1])
    n_pad = round_up(n, 128)
    if plan is None:
        m_local_guess = round_up(-(-a.shape[0] // n_dev), 8)
        sm = pair_spmm.pick_supertile_rows_pair(m_local_guess, n_pad, 8, 128)
        if sm is None:
            raise ValueError(
                f"per-shard output ({m_local_guess}x{n_pad}) narrower than "
                "one strip of VMEM budget; use local='tile'")
        plan = _cached_pair_shard_plan(
            a, n_dev, None if sm >= m_local_guess else sm)
    m, k = plan.shape
    if not interp and not pair_spmm.fits_vmem_pair(
            plan.sm, n_pad, plan.tm, plan.tk,
            chunk_strips=plan.chunk_strips):
        raise ValueError(
            f"per-shard output slab ({plan.sm}x{n_pad}) exceeds the VMEM "
            "residency budget; rebuild the shard plan with sm from "
            "pick_supertile_rows_pair, or pass plan=None to auto-supertile")
    k_pad = round_up(k, plan.tk)
    # pad on device — a host round trip per call would re-transfer the
    # largest operand through the tunnel on every serve
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plan.c_kt, P(axis)), shard(plan.c_st, P(axis)),
        shard(plan.c_start, P(axis)), shard(plan.c_count, P(axis)),
        shard(plan.offs, P(axis)), shard(plan.a_dense, P(axis)),
        shard(b_padded, P()),
    )
    fn = _row_sharded_pair_callable(
        mesh, axis, plan.m_local,
        tm=plan.tm, tk=plan.tk, chunk_strips=plan.chunk_strips,
        sm=plan.sm, n_st=plan.n_supertiles, interpret=interp)
    out = fn(*args)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# 2-D: rows × cols
# ---------------------------------------------------------------------------

def spmm_2d(a, b, mesh: Mesh, plan: Optional[RowShardedPlan] = None,
            interpret=None, local: str = "tile"):
    """C = A @ B on a 2-D mesh: A sharded over "rows", B over "cols".

    ``local`` selects the per-shard kernel like spmm_row_sharded: "tile"
    (default), "panel" (plan-time-densified flagship), "pair"
    (run-length, zero stored-plan padding), or "xla" (gather +
    segment-sum).  The panel/pair locals see only their column shard of
    B (n_local wide), so their VMEM slab admission is per-shard — a 2-D
    mesh admits outputs the replicated-B row-sharded schedule must
    supertile.
    """
    if local == "panel":
        return _spmm_2d_panel(a, b, mesh, plan, interpret)
    if local == "pair":
        return _spmm_2d_pair(a, b, mesh, plan, interpret)
    if local not in ("tile", "xla"):
        raise ValueError(
            f"spmm_2d local must be 'tile', 'xla', 'panel' or 'pair', "
            f"got {local!r}")
    n_rows = mesh.shape["rows"]
    n_cols = mesh.shape["cols"]
    interp = should_interpret(interpret)
    if plan is None:
        plan = shard_rows_tileplan(a, n_rows)
    m, k = plan.shape
    n = int(np.shape(b)[1])
    n_local = round_up(-(-n // n_cols), 128)
    tile_n = _divisor_tile_n(n_local)
    n_pad = n_local * n_cols
    k_pad = plan.num_k_tiles * plan.tile_k
    # pad on device — a host round trip per call would re-transfer the
    # largest operand through the tunnel on every serve
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plan.rt, P("rows")), shard(plan.kt, P("rows")), shard(plan.first, P("rows")),
        shard(plan.rows, P("rows")), shard(plan.cols, P("rows")), shard(plan.vals, P("rows")),
        shard(b_padded, P(None, "cols")),
    )
    fn = _spmm_2d_callable(
        mesh, local, plan.m_local,
        tm=plan.tile_m, tk=plan.tile_k, chunk=plan.chunk,
        num_row_tiles=plan.num_row_tiles, num_k_tiles=plan.num_k_tiles,
        tile_n=tile_n, interpret=interp)
    out = fn(*args)
    return out[:m, :n]


@functools.lru_cache(maxsize=64)
def _spmm_2d_callable(mesh, local, m_local, **static):
    def local_fn(rt, kt, first, rows, cols, vals, b_loc):
        from tpuspmm.kernels.tile_spmm import _tile_spmm

        if local == "tile":
            out = _tile_spmm(rt[0], kt[0], first[0], rows[0], cols[0],
                             vals[0], b_loc, **static)
        else:  # "xla": gather + segment-sum on this shard's B columns
            offs = rt[0].astype(jnp.int32) * static["tm"]
            kofs = kt[0].astype(jnp.int32) * static["tk"]
            gr = jnp.where(rows[0] < 0, -1,
                           rows[0] + offs[:, None]).reshape(-1)
            gc = (cols[0] + kofs[:, None]).reshape(-1)
            out = spmm_triplets(gr, gc, vals[0].reshape(-1), b_loc,
                                num_rows=m_local)
        return out[:m_local]

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P("rows"), P("rows"), P("rows"),
                  P(None, "cols")),
        out_specs=P("rows", "cols"), check_vma=False,
    ))


@functools.lru_cache(maxsize=64)
def _2d_panel_callable(mesh, m_local, **static):
    from tpuspmm.kernels.panel_spmm import _panel_spmm

    n_st = static["n_st"]
    sm = static["sm"]
    tm = static["tm"]

    def local_fn(kt, st, offs, a_dense, b_loc):
        out = _panel_spmm(kt, st, offs, a_dense, b_loc, **static)
        if n_st > 1:
            n_loc = out.shape[1]
            out = out.reshape(n_st, sm + tm, n_loc)[:, :sm, :]
            out = out.reshape(n_st * sm, n_loc)
        return out[:m_local]

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P("rows"),
                  P(None, "cols")),
        out_specs=P("rows", "cols"), check_vma=False,
    ))


def _spmm_2d_panel(a, b, mesh: Mesh, plan, interpret):
    """2-D schedule serving the panel kernel per (row, col) shard: each
    shard densifies its row slab against its n_local-wide B column shard
    — collective-free forward, and the per-shard VMEM slab only has to
    hold (sm × n_local)."""
    from tpuspmm.kernels import panel_spmm

    n_rows = mesh.shape["rows"]
    n_cols = mesh.shape["cols"]
    interp = should_interpret(interpret)
    n = int(np.shape(b)[1])
    n_local = round_up(-(-n // n_cols), 128)
    if plan is None:
        m_local_guess = round_up(-(-a.shape[0] // n_rows), 8)
        sm = panel_spmm.pick_supertile_rows(m_local_guess, n_local, 8, 128)
        if sm is None:
            raise ValueError(
                f"per-shard output ({m_local_guess}x{n_local}) narrower "
                "than one strip of VMEM budget; use local='tile'")
        plan = _cached_panel_shard_plan(
            a, n_rows, None if sm >= m_local_guess else sm)
    m, k = plan.shape
    if not interp and not panel_spmm.fits_vmem_panel(
            plan.sm, n_local, plan.tm, plan.tk,
            panel_strips=plan.panel_strips):
        raise ValueError(
            f"per-shard output slab ({plan.sm}x{n_local}) exceeds the "
            "VMEM residency budget; rebuild the shard plan with sm from "
            "pick_supertile_rows, or pass plan=None to auto-supertile")
    k_pad = round_up(k, plan.tk)
    n_pad = n_local * n_cols
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plan.kt, P("rows")), shard(plan.st, P("rows")),
        shard(plan.offs, P("rows")), shard(plan.a_dense, P("rows")),
        shard(b_padded, P(None, "cols")),
    )
    fn = _2d_panel_callable(
        mesh, plan.m_local,
        tm=plan.tm, tk=plan.tk, panel_strips=plan.panel_strips,
        sm=plan.sm, n_st=plan.n_supertiles, interpret=interp)
    out = fn(*args)
    return out[:m, :n]


@functools.lru_cache(maxsize=64)
def _2d_pair_callable(mesh, m_local, **static):
    from tpuspmm.kernels.pair_spmm import _pair_spmm

    n_st = static["n_st"]
    sm = static["sm"]
    tm = static["tm"]

    def local_fn(c_kt, c_st, c_start, c_count, offs, a_dense, b_loc):
        out = _pair_spmm(c_kt, c_st, c_start, c_count, offs, a_dense,
                         b_loc, **static)
        if n_st > 1:
            n_loc = out.shape[1]
            out = out.reshape(n_st, sm + tm, n_loc)[:, :sm, :]
            out = out.reshape(n_st * sm, n_loc)
        return out[:m_local]

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P("rows"), P("rows"),
                  P("rows"), P(None, "cols")),
        out_specs=P("rows", "cols"), check_vma=False,
    ))


def _spmm_2d_pair(a, b, mesh: Mesh, plan, interpret):
    """2-D schedule serving the run-length pair kernel per (row, col)
    shard — zero stored-plan padding, collective-free forward."""
    from tpuspmm.kernels import pair_spmm

    n_rows = mesh.shape["rows"]
    n_cols = mesh.shape["cols"]
    interp = should_interpret(interpret)
    n = int(np.shape(b)[1])
    n_local = round_up(-(-n // n_cols), 128)
    if plan is None:
        m_local_guess = round_up(-(-a.shape[0] // n_rows), 8)
        sm = pair_spmm.pick_supertile_rows_pair(m_local_guess, n_local,
                                                8, 128)
        if sm is None:
            raise ValueError(
                f"per-shard output ({m_local_guess}x{n_local}) narrower "
                "than one strip of VMEM budget; use local='tile'")
        plan = _cached_pair_shard_plan(
            a, n_rows, None if sm >= m_local_guess else sm)
    m, k = plan.shape
    if not interp and not pair_spmm.fits_vmem_pair(
            plan.sm, n_local, plan.tm, plan.tk,
            chunk_strips=plan.chunk_strips):
        raise ValueError(
            f"per-shard output slab ({plan.sm}x{n_local}) exceeds the "
            "VMEM residency budget; rebuild the shard plan with sm from "
            "pick_supertile_rows_pair, or pass plan=None to auto-supertile")
    k_pad = round_up(k, plan.tk)
    n_pad = n_local * n_cols
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plan.c_kt, P("rows")), shard(plan.c_st, P("rows")),
        shard(plan.c_start, P("rows")), shard(plan.c_count, P("rows")),
        shard(plan.offs, P("rows")), shard(plan.a_dense, P("rows")),
        shard(b_padded, P(None, "cols")),
    )
    fn = _2d_pair_callable(
        mesh, plan.m_local,
        tm=plan.tm, tk=plan.tk, chunk_strips=plan.chunk_strips,
        sm=plan.sm, n_st=plan.n_supertiles, interpret=interp)
    out = fn(*args)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# K-sharded: A column-partitioned, partial outputs reduce-scattered
# ---------------------------------------------------------------------------

def _cached_plan(a, key, build):
    """Container-level plan cache shared by every bucket-plan family:
    one place for the cache-attachment fallback (containers that refuse
    __setattr__ just rebuild)."""
    cache = getattr(a, "_plan_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(a, "_plan_cache", cache)
        except Exception:
            cache = None
    if cache is not None and key in cache:
        return cache[key]
    plans = build()
    if cache is not None:
        cache[key] = plans
    return plans


def _cached_bucket_tileplans(a, n_row, n_k, m_align=1) -> KBucketedTilePlans:
    return _cached_plan(
        a, ("bucket_tileplans", n_row, n_k, m_align),
        lambda: bucket_tileplans(a, n_row, n_k, m_align=m_align))


def _cached_bucket_pairplans(a, n_row, n_k, sm=None,
                             m_align=1) -> KBucketedPairPlans:
    return _cached_plan(
        a, ("bucket_pairplans", n_row, n_k, sm, m_align),
        lambda: bucket_pairplans(a, n_row, n_k, sm=sm, m_align=m_align))


def _cached_bucket_panelplans(a, n_row, n_k, sm=None,
                              m_align=1) -> KBucketedPanelPlans:
    return _cached_plan(
        a, ("bucket_panelplans", n_row, n_k, sm, m_align),
        lambda: bucket_panelplans(a, n_row, n_k, sm=sm, m_align=m_align))


def spmm_kshard(a, b, mesh: Mesh, axis: str = "rows",
                buckets: Optional[KBucketedTriplets] = None,
                local: str = "xla",
                plans: Optional[KBucketedTilePlans] = None,
                interpret=None):
    """C = A @ B with the *contraction* dimension sharded.

    Each chip owns a column slab of A (as triplets) and the matching K-rows
    of B, computes a full-height partial C, and a ``psum_scatter`` over the
    mesh axis both reduces the partials and leaves C row-sharded — the
    reduce-scatter decomposition, complementary to the ring schedule (which
    keeps A row-sharded and moves B instead).  Communication: one
    reduce-scatter of C per call, riding ICI.

    ``local``: "xla" = gather + segment-sum, "tile" = the Pallas
    tile-sparse MXU kernel per chip (VERDICT r2 #4), "pair" = the
    run-length pair kernel per chip (VERDICT r3 #7: the flagship kernel
    family computes each K-slab's full-height partial, then the
    reduce-scatter rides ICI), "panel" = the plan-time-densified panel
    kernel per chip (VERDICT r4 #4: the fastest single-chip kernel
    serves under the reduce-scatter too).
    """
    n_dev = mesh.shape[axis]
    n_orig = int(np.shape(b)[1])
    if local == "tile":
        if buckets is not None:
            raise ValueError(
                "spmm_kshard(local='tile') takes prebuilt TILE plans via "
                "plans= (bucket_tileplans), not triplet buckets=; the "
                "buckets would be silently rebuilt otherwise")
        return _spmm_kshard_tile(a, b, mesh, axis, plans, interpret)
    if local == "pair":
        if buckets is not None:
            raise ValueError(
                "spmm_kshard(local='pair') takes prebuilt PAIR plans via "
                "plans= (bucket_pairplans), not triplet buckets=; the "
                "buckets would be silently rebuilt otherwise")
        return _spmm_kshard_pair(a, b, mesh, axis, plans, interpret)
    if local == "panel":
        if buckets is not None:
            raise ValueError(
                "spmm_kshard(local='panel') takes prebuilt PANEL plans via "
                "plans= (bucket_panelplans), not triplet buckets=; the "
                "buckets would be silently rebuilt otherwise")
        return _spmm_kshard_panel(a, b, mesh, axis, plans, interpret)
    if local != "xla":
        raise ValueError(
            f"spmm_kshard local must be 'xla', 'tile', 'panel' or 'pair', "
            f"got {local!r}")
    if buckets is None:
        # single row shard, K bucketed: buckets.rows is (1, S, E)
        buckets = bucket_triplets(a, 1, n_dev, m_align=8 * n_dev)
    # ring-style buckets (n_row_shards > 1) would silently drop every row
    # shard after the first, and the psum_scatter needs an even row split
    if buckets.n_row_shards != 1:
        raise ValueError(
            f"spmm_kshard needs K-bucketed triplets (n_row_shards == 1), "
            f"got {buckets.n_row_shards}; rebuild with bucket_triplets(a, 1, n_dev)")
    if buckets.m_local % n_dev != 0:
        raise ValueError(
            f"m_local={buckets.m_local} not divisible by mesh axis size "
            f"{n_dev}; rebuild buckets with m_align={8 * n_dev}")
    m, k = buckets.shape
    m_pad = buckets.m_local  # aligned so the scatter splits evenly
    k_local = buckets.k_local
    b_padded = pad_dense_rows(b, k_local * n_dev)

    shard = functools.partial(_put, mesh)
    args = (
        shard(buckets.rows[0], P(axis)),   # (S, E) → local (1, E)
        shard(buckets.cols[0], P(axis)),
        shard(buckets.vals[0], P(axis)),
        shard(b_padded, P(axis)),
    )
    fn = _kshard_callable(mesh, axis, m_pad)
    out = fn(*args)
    return out[:m, :n_orig]


@functools.lru_cache(maxsize=64)
def _kshard_callable(mesh, axis, m_pad):
    def local_fn(rows, cols, vals, b_panel):
        partial = spmm_triplets(rows[0], cols[0], vals[0], b_panel,
                                num_rows=m_pad)
        return jax.lax.psum_scatter(partial, axis, scatter_dimension=0,
                                    tiled=True)

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    ))


def _spmm_kshard_tile(a, b, mesh: Mesh, axis: str,
                      plans: Optional[KBucketedTilePlans], interpret):
    """Reduce-scatter schedule with the Pallas tile kernel as the local
    compute: each chip lowers its K-slab of A through the one-hot MXU
    densify path instead of the XLA segment-sum (VERDICT r2 #4 — the
    segment-sum local was the slowest strategy in the library)."""
    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    n_orig = int(np.shape(b)[1])
    if plans is None:
        plans = _cached_bucket_tileplans(a, 1, n_dev, m_align=n_dev)
    if plans.n_row_shards != 1:
        raise ValueError("spmm_kshard needs n_row_shards == 1 tile plans")
    if plans.m_local % n_dev != 0:
        raise ValueError(
            f"m_local={plans.m_local} not divisible by {n_dev}; rebuild "
            f"with bucket_tileplans(a, 1, n_dev, m_align=n_dev)")
    m, k = plans.shape
    n_pad = round_up(n_orig, 128)
    tile_n = _divisor_tile_n(n_pad)
    # pad on device — forcing B to host per call would round-trip the
    # largest operand through the tunnel on every serve (review r3)
    b_padded = pad_dense_rows(b, plans.k_local * n_dev)
    if n_pad != n_orig:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n_orig)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plans.rt[0], P(axis)), shard(plans.kt[0], P(axis)),
        shard(plans.first[0], P(axis)),
        shard(plans.rows[0], P(axis)), shard(plans.cols[0], P(axis)),
        shard(plans.vals[0], P(axis)),
        shard(b_padded, P(axis)),
    )
    fn = _kshard_tile_callable(
        mesh, axis, plans.m_local,
        tm=plans.tile_m, tk=plans.tile_k, chunk=plans.chunk,
        num_row_tiles=plans.num_row_tiles, num_k_tiles=plans.num_k_tiles,
        tile_n=tile_n, interpret=interp)
    out = fn(*args)
    return out[:m, :n_orig]


@functools.lru_cache(maxsize=64)
def _kshard_tile_callable(mesh, axis, m_local, **static):
    def local_fn(rt, kt, first, rows, cols, vals, b_panel):
        from tpuspmm.kernels.tile_spmm import _tile_spmm

        partial = _tile_spmm(rt[0], kt[0], first[0],
                             rows[0], cols[0], vals[0], b_panel, **static)
        return jax.lax.psum_scatter(partial[:m_local], axis,
                                    scatter_dimension=0, tiled=True)

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=P(axis), check_vma=False,
    ))


def _spmm_kshard_pair(a, b, mesh: Mesh, axis: str,
                      plans: Optional[KBucketedPairPlans], interpret):
    """Reduce-scatter schedule with the run-length pair kernel as the
    local compute: each chip pre-densified its K-slab of A into strip
    runs at plan time and serves them through the in-kernel-DMA pair
    kernel; psum_scatter reduces the full-height partials and leaves C
    row-sharded (VERDICT r3 #7)."""
    from tpuspmm.kernels import pair_spmm

    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    n_orig = int(np.shape(b)[1])
    if plans is None:
        plans = _cached_bucket_pairplans(a, 1, n_dev, m_align=n_dev)
    if plans.n_row_shards != 1:
        raise ValueError("spmm_kshard needs n_row_shards == 1 pair plans")
    if plans.m_local % n_dev != 0:
        raise ValueError(
            f"m_local={plans.m_local} not divisible by {n_dev}; rebuild "
            f"with bucket_pairplans(a, 1, n_dev, m_align=n_dev)")
    m, k = plans.shape
    n_pad = round_up(n_orig, 128)
    if not interp and not pair_spmm.fits_vmem_pair(
            plans.sm, n_pad, plans.tm, plans.tk,
            chunk_strips=plans.chunk_strips):
        raise ValueError(
            f"full-height output slab ({plans.sm}x{n_pad}) exceeds the "
            "VMEM residency budget; rebuild the bucket plans with a "
            "smaller sm (bucket_pairplans(..., sm=...)) or use "
            "local='tile'")
    b_padded = pad_dense_rows(b, plans.k_local * n_dev)
    if n_pad != n_orig:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n_orig)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plans.c_kt[0], P(axis)), shard(plans.c_st[0], P(axis)),
        shard(plans.c_start[0], P(axis)), shard(plans.c_count[0], P(axis)),
        shard(plans.offs[0], P(axis)), shard(plans.a_dense[0], P(axis)),
        shard(b_padded, P(axis)),
    )
    fn = _kshard_pair_callable(
        mesh, axis, plans.m_local,
        tm=plans.tm, tk=plans.tk, chunk_strips=plans.chunk_strips,
        sm=plans.sm, n_st=plans.n_supertiles, interpret=interp)
    out = fn(*args)
    return out[:m, :n_orig]


def _spmm_kshard_panel(a, b, mesh: Mesh, axis: str,
                       plans: Optional[KBucketedPanelPlans], interpret):
    """Reduce-scatter schedule with the PANEL kernel as the local
    compute: each chip pre-densified its K-slab of A into MXU panels at
    plan time and serves them through the flagship panel kernel;
    psum_scatter reduces the full-height partials and leaves C
    row-sharded (VERDICT r4 weak #4 — the fastest single-chip kernel now
    serves under the communicating schedules too)."""
    from tpuspmm.kernels import panel_spmm

    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    n_orig = int(np.shape(b)[1])
    if plans is None:
        plans = _cached_bucket_panelplans(a, 1, n_dev, m_align=n_dev)
    if plans.n_row_shards != 1:
        raise ValueError("spmm_kshard needs n_row_shards == 1 panel plans")
    if plans.m_local % n_dev != 0:
        raise ValueError(
            f"m_local={plans.m_local} not divisible by {n_dev}; rebuild "
            f"with bucket_panelplans(a, 1, n_dev, m_align=n_dev)")
    m, k = plans.shape
    n_pad = round_up(n_orig, 128)
    if not interp and not panel_spmm.fits_vmem_panel(
            plans.sm, n_pad, plans.tm, plans.tk,
            panel_strips=plans.panel_strips):
        raise ValueError(
            f"full-height output slab ({plans.sm}x{n_pad}) exceeds the "
            "VMEM residency budget; rebuild the bucket plans with a "
            "smaller sm (bucket_panelplans(..., sm=...)) or use "
            "local='tile'")
    b_padded = pad_dense_rows(b, plans.k_local * n_dev)
    if n_pad != n_orig:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n_orig)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plans.kt[0], P(axis)), shard(plans.st[0], P(axis)),
        shard(plans.offs[0], P(axis)), shard(plans.a_dense[0], P(axis)),
        shard(b_padded, P(axis)),
    )
    fn = _kshard_panel_callable(
        mesh, axis, plans.m_local,
        tm=plans.tm, tk=plans.tk, panel_strips=plans.panel_strips,
        sm=plans.sm, n_st=plans.n_supertiles, interpret=interp)
    out = fn(*args)
    return out[:m, :n_orig]


@functools.lru_cache(maxsize=64)
def _kshard_panel_callable(mesh, axis, m_local, **static):
    from tpuspmm.kernels.panel_spmm import _panel_spmm

    n_st = static["n_st"]
    sm = static["sm"]
    tm = static["tm"]

    def local_fn(kt, st, offs, a_dense, b_panel):
        partial = _panel_spmm(kt[0], st[0], offs[0], a_dense[0], b_panel,
                              **static)
        if n_st > 1:
            n_w = partial.shape[1]
            partial = partial.reshape(n_st, sm + tm, n_w)[:, :sm, :]
            partial = partial.reshape(n_st * sm, n_w)
        return jax.lax.psum_scatter(partial[:m_local], axis,
                                    scatter_dimension=0, tiled=True)

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis), check_vma=False,
    ))


@functools.lru_cache(maxsize=64)
def _kshard_pair_callable(mesh, axis, m_local, **static):
    from tpuspmm.kernels.pair_spmm import _pair_spmm

    n_st = static["n_st"]
    sm = static["sm"]
    tm = static["tm"]

    def local_fn(c_kt, c_st, c_start, c_count, offs, a_dense, b_panel):
        partial = _pair_spmm(c_kt[0], c_st[0], c_start[0], c_count[0],
                             offs[0], a_dense[0], b_panel, **static)
        if n_st > 1:
            n_w = partial.shape[1]
            partial = partial.reshape(n_st, sm + tm, n_w)[:, :sm, :]
            partial = partial.reshape(n_st * sm, n_w)
        return jax.lax.psum_scatter(partial[:m_local], axis,
                                    scatter_dimension=0, tiled=True)

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=P(axis), check_vma=False,
    ))


# ---------------------------------------------------------------------------
# ring: B K-sharded, panels ppermuted around the mesh axis
# ---------------------------------------------------------------------------

def spmm_ring(a, b, mesh: Mesh, axis: str = "rows",
              cols_axis: Optional[str] = None,
              buckets: Optional[KBucketedTriplets] = None,
              local: str = "xla",
              plans: Optional[KBucketedTilePlans] = None,
              interpret=None):
    """C = A @ B with B sharded along K; panels ride the ICI ring.

    Device d starts with panel d.  At ring step i it holds panel
    ``src = (d - i) mod n`` and multiplies bucket ``src`` of its row slab
    against it while ``ppermute`` forwards the panel to ``d + 1``.  After n
    steps every bucket has met its panel; the accumulator is the local C
    slab.  Communication volume per chip: (n-1)/n of B, pipelined.

    ``local``: "xla" = gather + segment-sum per bucket, "tile" = the
    Pallas tile-sparse MXU kernel per bucket (VERDICT r2 #4 / the
    BASELINE north-star "B panels overlapped with local tile compute") —
    each ring step dynamically selects its bucket's tile plan and the
    ppermute still overlaps the Pallas call.  "pair" = the run-length
    pair kernel per bucket (VERDICT r3 #7: the flagship kernel family in
    the communicating schedule): per-(shard, bucket) pre-densified strip
    runs, ``jnp.take``n by ring step, zero alignment padding in the
    stored plan.  "panel" = the plan-time-densified panel kernel per
    bucket (VERDICT r4 #4: the fastest single-chip kernel as the
    overlapped local compute).
    """
    n_dev = mesh.shape[axis]
    n_orig = int(np.shape(b)[1])
    if local == "tile":
        if buckets is not None:
            raise ValueError(
                "spmm_ring(local='tile') takes prebuilt TILE plans via "
                "plans= (bucket_tileplans), not triplet buckets=; the "
                "buckets would be silently rebuilt otherwise")
        return _spmm_ring_tile(a, b, mesh, axis, cols_axis, plans, interpret)
    if local == "pair":
        if buckets is not None:
            raise ValueError(
                "spmm_ring(local='pair') takes prebuilt PAIR plans via "
                "plans= (bucket_pairplans), not triplet buckets=; the "
                "buckets would be silently rebuilt otherwise")
        return _spmm_ring_pair(a, b, mesh, axis, cols_axis, plans, interpret)
    if local == "panel":
        if buckets is not None:
            raise ValueError(
                "spmm_ring(local='panel') takes prebuilt PANEL plans via "
                "plans= (bucket_panelplans), not triplet buckets=; the "
                "buckets would be silently rebuilt otherwise")
        return _spmm_ring_panel(a, b, mesh, axis, cols_axis, plans,
                                interpret)
    if local != "xla":
        raise ValueError(
            f"spmm_ring local must be 'xla', 'tile', 'panel' or 'pair', "
            f"got {local!r}")
    if buckets is None:
        buckets = bucket_triplets(a, n_dev, n_dev)
    m, k = buckets.shape
    m_local, k_local = buckets.m_local, buckets.k_local
    b_padded = pad_dense_rows(b, k_local * n_dev)
    n = b_padded.shape[1]
    # optional second mesh axis: B (and C) column-sharded; the ring then
    # runs independently inside each column group, all hops on ICI
    if cols_axis is not None:
        n_cols = mesh.shape[cols_axis]
        n_pad = -(-n // n_cols) * n_cols
        if n_pad != n:
            b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n)))
        b_spec = P(axis, cols_axis)
    else:
        b_spec = P(axis)

    shard = functools.partial(_put, mesh)
    args = (
        shard(buckets.rows, P(axis)),
        shard(buckets.cols, P(axis)),
        shard(buckets.vals, P(axis)),
        shard(b_padded, b_spec),
    )
    fn = _ring_callable(mesh, axis, cols_axis, n_dev, m_local)
    out = fn(*args)
    return out[:m, :n_orig]


@functools.lru_cache(maxsize=64)
def _ring_callable(mesh, axis, cols_axis, n_dev, m_local):
    perm = tuple((j, (j + 1) % n_dev) for j in range(n_dev))
    vary_axes = (axis,) if cols_axis is None else (axis, cols_axis)
    b_spec = P(axis) if cols_axis is None else P(axis, cols_axis)

    def local_fn(rows, cols, vals, b_panel):
        rows, cols, vals = rows[0], cols[0], vals[0]  # (S, E)
        idx = jax.lax.axis_index(axis)
        # the accumulator joins a carry with mesh-varying b_panel
        acc0 = jax.lax.pcast(
            jnp.zeros((m_local, b_panel.shape[1]), jnp.float32),
            vary_axes, to="varying")

        def body(i, carry):
            b_cur, acc = carry
            src = (idx - i) % n_dev
            r = jnp.take(rows, src, axis=0)
            c = jnp.take(cols, src, axis=0)
            v = jnp.take(vals, src, axis=0)
            # the send depends only on b_cur — XLA overlaps it with compute
            b_nxt = jax.lax.ppermute(b_cur, axis, list(perm))
            acc = acc + spmm_triplets(r, c, v, b_cur, num_rows=m_local)
            return (b_nxt, acc)

        _, acc = jax.lax.fori_loop(0, n_dev, body, (b_panel, acc0))
        return acc

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), b_spec),
        out_specs=b_spec if cols_axis is not None else P(axis),
    ))


def _spmm_ring_tile(a, b, mesh: Mesh, axis: str, cols_axis: Optional[str],
                    plans: Optional[KBucketedTilePlans], interpret):
    """Ring schedule serving the Pallas tile kernel per (shard, bucket):
    every ring step ``jnp.take``s its bucket's stacked tile plan and runs
    the one-hot MXU densify kernel against the B panel it currently
    holds, while ppermute forwards the panel — compute/communication
    overlap with the fast local kernel (VERDICT r2 #4)."""
    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    n_orig = int(np.shape(b)[1])
    if plans is None:
        plans = _cached_bucket_tileplans(a, n_dev, n_dev)
    m, k = plans.shape
    k_pad = plans.k_local * n_dev
    if cols_axis is not None:
        n_cols = mesh.shape[cols_axis]
        n_local = round_up(-(-n_orig // n_cols), 128)
        n_pad = n_local * n_cols
        b_spec = P(axis, cols_axis)
    else:
        n_local = n_pad = round_up(n_orig, 128)
        b_spec = P(axis)
    tile_n = _divisor_tile_n(n_local)
    # pad on device — forcing B to host per call would round-trip the
    # largest operand through the tunnel on every serve (review r3)
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n_orig:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n_orig)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plans.rt, P(axis)), shard(plans.kt, P(axis)),
        shard(plans.first, P(axis)),
        shard(plans.rows, P(axis)), shard(plans.cols, P(axis)),
        shard(plans.vals, P(axis)),
        shard(b_padded, b_spec),
    )
    fn = _ring_tile_callable(
        mesh, axis, cols_axis, n_dev, plans.m_local,
        tm=plans.tile_m, tk=plans.tile_k, chunk=plans.chunk,
        num_row_tiles=plans.num_row_tiles, num_k_tiles=plans.num_k_tiles,
        tile_n=tile_n, interpret=interp)
    out = fn(*args)
    return out[:m, :n_orig]


def _spmm_ring_pair(a, b, mesh: Mesh, axis: str, cols_axis: Optional[str],
                    plans: Optional[KBucketedPairPlans], interpret):
    """Ring schedule serving the run-length PAIR kernel per (shard,
    bucket): every ring step ``jnp.take``s its bucket's stacked pair plan
    and runs the in-kernel-DMA strip-run kernel against the B panel it
    currently holds, while ppermute forwards the panel (VERDICT r3 #7 —
    the BASELINE north-star with the flagship kernel family as the
    overlapped local compute)."""
    from tpuspmm.kernels import pair_spmm

    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    n_orig = int(np.shape(b)[1])
    if plans is None:
        plans = _cached_bucket_pairplans(a, n_dev, n_dev)
    m, k = plans.shape
    k_pad = plans.k_local * n_dev
    if cols_axis is not None:
        n_cols = mesh.shape[cols_axis]
        n_local = round_up(-(-n_orig // n_cols), 128)
        n_pad = n_local * n_cols
        b_spec = P(axis, cols_axis)
    else:
        n_local = n_pad = round_up(n_orig, 128)
        b_spec = P(axis)
    if not interp and not pair_spmm.fits_vmem_pair(
            plans.sm, n_local, plans.tm, plans.tk,
            chunk_strips=plans.chunk_strips):
        raise ValueError(
            f"per-shard output slab ({plans.sm}x{n_local}) exceeds the "
            "VMEM residency budget; rebuild the bucket plans with a "
            "smaller sm (bucket_pairplans(..., sm=...)) or use "
            "local='tile'")
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n_orig:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n_orig)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plans.c_kt, P(axis)), shard(plans.c_st, P(axis)),
        shard(plans.c_start, P(axis)), shard(plans.c_count, P(axis)),
        shard(plans.offs, P(axis)), shard(plans.a_dense, P(axis)),
        shard(b_padded, b_spec),
    )
    fn = _ring_pair_callable(
        mesh, axis, cols_axis, n_dev, plans.m_local,
        tm=plans.tm, tk=plans.tk, chunk_strips=plans.chunk_strips,
        sm=plans.sm, n_st=plans.n_supertiles, interpret=interp)
    out = fn(*args)
    return out[:m, :n_orig]


def _spmm_ring_panel(a, b, mesh: Mesh, axis: str, cols_axis: Optional[str],
                     plans: Optional[KBucketedPanelPlans], interpret):
    """Ring schedule serving the PANEL kernel per (shard, bucket): every
    ring step ``jnp.take``s its bucket's stacked panel plan and runs the
    plan-time-densified flagship kernel against the B panel it currently
    holds, while ppermute forwards the panel (VERDICT r4 weak #4 — the
    BASELINE north-star with the *fastest* single-chip kernel as the
    overlapped local compute)."""
    from tpuspmm.kernels import panel_spmm

    n_dev = mesh.shape[axis]
    interp = should_interpret(interpret)
    n_orig = int(np.shape(b)[1])
    if plans is None:
        plans = _cached_bucket_panelplans(a, n_dev, n_dev)
    m, k = plans.shape
    k_pad = plans.k_local * n_dev
    if cols_axis is not None:
        n_cols = mesh.shape[cols_axis]
        n_local = round_up(-(-n_orig // n_cols), 128)
        n_pad = n_local * n_cols
        b_spec = P(axis, cols_axis)
    else:
        n_local = n_pad = round_up(n_orig, 128)
        b_spec = P(axis)
    if not interp and not panel_spmm.fits_vmem_panel(
            plans.sm, n_local, plans.tm, plans.tk,
            panel_strips=plans.panel_strips):
        raise ValueError(
            f"per-shard output slab ({plans.sm}x{n_local}) exceeds the "
            "VMEM residency budget; rebuild the bucket plans with a "
            "smaller sm (bucket_panelplans(..., sm=...)) or use "
            "local='tile'")
    b_padded = pad_dense_rows(b, k_pad)
    if n_pad != n_orig:
        b_padded = jnp.pad(b_padded, ((0, 0), (0, n_pad - n_orig)))

    shard = functools.partial(_put, mesh)
    args = (
        shard(plans.kt, P(axis)), shard(plans.st, P(axis)),
        shard(plans.offs, P(axis)), shard(plans.a_dense, P(axis)),
        shard(b_padded, b_spec),
    )
    fn = _ring_panel_callable(
        mesh, axis, cols_axis, n_dev, plans.m_local,
        tm=plans.tm, tk=plans.tk, panel_strips=plans.panel_strips,
        sm=plans.sm, n_st=plans.n_supertiles, interpret=interp)
    out = fn(*args)
    return out[:m, :n_orig]


@functools.lru_cache(maxsize=64)
def _ring_panel_callable(mesh, axis, cols_axis, n_dev, m_local, **static):
    from tpuspmm.kernels.panel_spmm import _panel_spmm

    perm = tuple((j, (j + 1) % n_dev) for j in range(n_dev))
    vary_axes = (axis,) if cols_axis is None else (axis, cols_axis)
    b_spec = P(axis) if cols_axis is None else P(axis, cols_axis)
    n_st = static["n_st"]
    sm = static["sm"]
    tm = static["tm"]

    def local_fn(kt, st, offs, a_dense, b_panel):
        # local leading dims: (1, S, ...) — drop the shard dim
        kt, st = kt[0], st[0]
        offs, a_dense = offs[0], a_dense[0]
        idx = jax.lax.axis_index(axis)
        acc0 = jax.lax.pcast(
            jnp.zeros((m_local, b_panel.shape[1]), jnp.float32),
            vary_axes, to="varying")

        def body(i, carry):
            b_cur, acc = carry
            src = (idx - i) % n_dev
            take = lambda x: jnp.take(x, src, axis=0)
            # the send depends only on b_cur — XLA overlaps it with the
            # Pallas call below
            b_nxt = jax.lax.ppermute(b_cur, axis, list(perm))
            out = _panel_spmm(take(kt), take(st), take(offs),
                              take(a_dense), b_cur, **static)
            if n_st > 1:
                n_w = out.shape[1]
                out = out.reshape(n_st, sm + tm, n_w)[:, :sm, :]
                out = out.reshape(n_st * sm, n_w)
            return (b_nxt, acc + out[:m_local])

        _, acc = jax.lax.fori_loop(0, n_dev, body, (b_panel, acc0))
        return acc

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), b_spec),
        out_specs=b_spec if cols_axis is not None else P(axis),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=64)
def _ring_pair_callable(mesh, axis, cols_axis, n_dev, m_local, **static):
    from tpuspmm.kernels.pair_spmm import _pair_spmm

    perm = tuple((j, (j + 1) % n_dev) for j in range(n_dev))
    vary_axes = (axis,) if cols_axis is None else (axis, cols_axis)
    b_spec = P(axis) if cols_axis is None else P(axis, cols_axis)
    n_st = static["n_st"]
    sm = static["sm"]
    tm = static["tm"]

    def local_fn(c_kt, c_st, c_start, c_count, offs, a_dense, b_panel):
        # local leading dims: (1, S, ...) — drop the shard dim
        c_kt, c_st = c_kt[0], c_st[0]
        c_start, c_count = c_start[0], c_count[0]
        offs, a_dense = offs[0], a_dense[0]
        idx = jax.lax.axis_index(axis)
        acc0 = jax.lax.pcast(
            jnp.zeros((m_local, b_panel.shape[1]), jnp.float32),
            vary_axes, to="varying")

        def body(i, carry):
            b_cur, acc = carry
            src = (idx - i) % n_dev
            take = lambda x: jnp.take(x, src, axis=0)
            # the send depends only on b_cur — XLA overlaps it with the
            # Pallas call below
            b_nxt = jax.lax.ppermute(b_cur, axis, list(perm))
            out = _pair_spmm(take(c_kt), take(c_st), take(c_start),
                             take(c_count), take(offs), take(a_dense),
                             b_cur, **static)
            if n_st > 1:
                n_w = out.shape[1]
                out = out.reshape(n_st, sm + tm, n_w)[:, :sm, :]
                out = out.reshape(n_st * sm, n_w)
            return (b_nxt, acc + out[:m_local])

        _, acc = jax.lax.fori_loop(0, n_dev, body, (b_panel, acc0))
        return acc

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  b_spec),
        out_specs=b_spec if cols_axis is not None else P(axis),
        check_vma=False,
    ))


@functools.lru_cache(maxsize=64)
def _ring_tile_callable(mesh, axis, cols_axis, n_dev, m_local, **static):
    perm = tuple((j, (j + 1) % n_dev) for j in range(n_dev))
    vary_axes = (axis,) if cols_axis is None else (axis, cols_axis)
    b_spec = P(axis) if cols_axis is None else P(axis, cols_axis)

    def local_fn(rt, kt, first, rows, cols, vals, b_panel):
        from tpuspmm.kernels.tile_spmm import _tile_spmm

        # local leading dims: (1, S, C[, E]) — drop the shard dim
        rt, kt, first = rt[0], kt[0], first[0]
        rows, cols, vals = rows[0], cols[0], vals[0]
        idx = jax.lax.axis_index(axis)
        acc0 = jax.lax.pcast(
            jnp.zeros((m_local, b_panel.shape[1]), jnp.float32),
            vary_axes, to="varying")

        def body(i, carry):
            b_cur, acc = carry
            src = (idx - i) % n_dev
            take = lambda x: jnp.take(x, src, axis=0)
            # the send depends only on b_cur — XLA overlaps it with the
            # Pallas call below
            b_nxt = jax.lax.ppermute(b_cur, axis, list(perm))
            out = _tile_spmm(take(rt), take(kt), take(first),
                             take(rows), take(cols), take(vals),
                             b_cur, **static)
            return (b_nxt, acc + out[:m_local])

        _, acc = jax.lax.fori_loop(0, n_dev, body, (b_panel, acc0))
        return acc

    return jax.jit(jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  b_spec),
        out_specs=b_spec if cols_axis is not None else P(axis),
        check_vma=False,
    ))
