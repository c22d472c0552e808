"""Run-length pair-kernel tests (kernels/pair_spmm).

The generic variant sweep (test_kernels.py / test_engine.py) drives
pallas_pair through the registry; this file covers the run-length plan
builder's edge cases — unaligned strip runs, chunk-boundary masking,
supertiling, CH degradation — and the zero-padding property that is the
kernel's reason to exist.
"""

import numpy as np
import pytest
import scipy.sparse

from tpuspmm.config import Config
from tpuspmm.formats import COO, convert
from tpuspmm.kernels import pair_spmm, panel_spmm
from tpuspmm.ops import oracle
from tpuspmm.utils.compare import allclose

CFG = Config(interpret=True)


def _rand_coo(m, k, density, seed=0):
    rng = np.random.default_rng(seed)
    sp = scipy.sparse.random(
        m, k, density=density, format="coo", random_state=rng,
        data_rvs=lambda n: rng.uniform(-100, 100, n))
    return convert.to_format(sp.tocsr(), "coo"), sp


@pytest.mark.parametrize("shape,density", [
    ((100, 300), 0.01),   # multiple k-tiles, ragged m
    ((257, 515), 0.02),   # ragged both dims → trash strip in play
    ((16, 128), 0.5),     # exactly one aligned pair
    ((8, 8), 1.0),        # smaller than one strip
])
def test_pair_matches_oracle(shape, density):
    a, _ = _rand_coo(*shape, density, seed=shape[0])
    rng = np.random.default_rng(1)
    b = rng.uniform(-1, 1, (shape[1], 70)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(pair_spmm.spmm_pair(a, b, interpret=True))
    assert out.shape == ref.shape
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_plan_stores_no_padding():
    # the defining property vs the panel plan: strips == occupied
    # (supertile, k-tile, octet) groups, plus only the global CH zero tail
    a, _ = _rand_coo(300, 900, 0.02, seed=5)
    plan = pair_spmm.pair_plan_from_container(a, reorder_rows=False)
    rows = np.asarray(a.rows)
    groups = len(np.unique((rows // 8).astype(np.int64) * plan.num_k_tiles
                           + np.asarray(a.cols) // 128))
    assert plan.n_strips == groups
    assert plan.a_dense.shape[0] == (groups + plan.chunk_strips) * plan.tm
    # runs partition the strips exactly
    assert int(plan.count.sum()) == groups
    ends = plan.start + plan.count
    nz = plan.count > 0
    assert (np.diff(plan.start[nz]) >= 0).all()
    # panel plan of the same matrix AT THE SAME (tm, tk) stores strictly
    # more strips (padding) — pin the geometry the group count was
    # computed at, since the auto search may pick wider tiles
    ppanel = panel_spmm.panel_plan_from_container(a, tm=8, tk=128,
                                                  reorder_rows=False)
    assert ppanel.a_dense.shape[0] // 8 > groups


def test_chunk_boundary_masking():
    # a pair whose strip count is NOT a multiple of CH: the final chunk
    # reads into the next pair's strips, which must be masked to trash —
    # their values multiplied against the WRONG B tile would corrupt C
    rng = np.random.default_rng(3)
    m = 8 * 50
    rows = np.arange(0, m, 8, dtype=np.int32).repeat(2)  # 50 octets
    # first 50 nnz in k-tile 0, next 50 in k-tile 1 → two pairs of 50
    cols = np.concatenate([rng.integers(0, 128, 50),
                           rng.integers(128, 256, 50)]).astype(np.int32)
    rows = np.concatenate([rows[:50], rows[:50]]).astype(np.int32)
    vals = rng.uniform(-5, 5, 100).astype(np.float32)
    a = COO(shape=(m, 256), rows=rows, cols=cols, values=vals)
    b = rng.uniform(-1, 1, (256, 32)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    plan = pair_spmm.pair_plan_from_container(a, chunk_strips=32,
                                              reorder_rows=False)
    assert (plan.count[plan.count > 0] % plan.chunk_strips != 0).any()
    out = np.asarray(pair_spmm.spmm_pair(plan, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_supertiled_and_ch_degradation():
    a, _ = _rand_coo(600, 300, 0.01, seed=23)
    rng = np.random.default_rng(3)
    b = rng.uniform(-1, 1, (300, 70)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    geom = pair_spmm.resolve_pair_geometry(a, 128, budget_bytes=400_000)
    assert geom is not None and geom.sm < 600
    assert geom.chunk_strips < pair_spmm.CHUNK_STRIPS  # buffers degraded
    out = np.asarray(pair_spmm.spmm_pair(a, b, interpret=True,
                                         budget_bytes=400_000))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_empty_matrix_and_empty_supertile():
    a = COO(shape=(20, 40), rows=np.zeros(0, np.int32),
            cols=np.zeros(0, np.int32), values=np.zeros(0, np.float32))
    out = np.asarray(pair_spmm.spmm_pair(a, np.ones((40, 8), np.float32),
                                         interpret=True))
    assert out.shape == (20, 8) and not out.any()
    # rows 200..399 empty → an empty supertile slab must come back zeroed
    rows = np.array([0, 1, 599], np.int32)
    cols = np.array([0, 5, 120], np.int32)
    vals = np.array([2.0, 3.0, 4.0], np.float32)
    a2 = COO(shape=(600, 128), rows=rows, cols=cols, values=vals)
    out2 = np.asarray(pair_spmm.spmm_pair(a2, np.eye(128, dtype=np.float32),
                                          interpret=True,
                                          budget_bytes=340_000))
    assert out2[0, 0] == pytest.approx(2.0)
    assert out2[1, 5] == pytest.approx(3.0)
    assert out2[599, 120] == pytest.approx(4.0)
    assert np.count_nonzero(out2) == 3


def test_bf16_plan_and_precision_tiers():
    import ml_dtypes

    rng = np.random.default_rng(9)
    m, k, per_row = 100, 300, 4
    rows = np.repeat(np.arange(m, dtype=np.int32), per_row)
    cols = rng.integers(0, k, m * per_row).astype(np.int32)
    vals = rng.choice([-1.0, 1.0], m * per_row).astype(np.float32)
    a = COO(shape=(m, k), rows=rows, cols=cols, values=vals)
    plan = pair_spmm.pair_plan_from_container(a)
    assert plan.a_dense.dtype == ml_dtypes.bfloat16
    b = rng.uniform(-1, 1, (k, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(pair_spmm.spmm_pair(a, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)
    out_s = np.asarray(pair_spmm.spmm_pair(a, b, interpret=True,
                                           mode="split2"))
    assert allclose(out_s, ref, CFG.rel_tol, CFG.abs_tol)


def test_duplicates_accumulate():
    rows = np.array([0, 0, 3, 3, 3], np.int32)
    cols = np.array([1, 1, 2, 2, 2], np.int32)
    vals = np.array([1.0, 2.0, 10.0, -4.0, 1.0], np.float32)
    a = COO(shape=(5, 4), rows=rows, cols=cols, values=vals)
    out = np.asarray(pair_spmm.spmm_pair(a, np.eye(4, dtype=np.float32),
                                         interpret=True))
    assert out[0, 1] == pytest.approx(3.0)
    assert out[3, 2] == pytest.approx(7.0)
    assert np.count_nonzero(out) == 2


def test_registry_variant_served_and_verified_tiers():
    from tpuspmm.engine.registry import get_engine

    for fmt in ("csr", "coo", "bsr", "ell"):
        names = {v.name: v for v in get_engine(fmt).variants}
        assert "pallas_pair" in names
        assert not names["pallas_pair"].verified_only
    csr = {v.name: v for v in get_engine("csr").variants}
    assert csr["pallas_pair_split"].verified_only


def test_row_reordered_pair_matches_oracle():
    rng = np.random.default_rng(43)
    m, k, per_row = 512, 512, 6
    rows = np.repeat(np.arange(m, dtype=np.int32), per_row)
    cols = np.where((rows % 2) == 0,
                    rng.integers(0, 128, m * per_row),
                    rng.integers(384, 512, m * per_row)).astype(np.int32)
    vals = rng.uniform(-10, 10, m * per_row).astype(np.float32)
    a = COO(shape=(m, k), rows=rows, cols=cols, values=vals)
    # at this size the resolver correctly REJECTS reordering (the
    # un-permute gather charge outweighs the strip savings)…
    geom = pair_spmm.resolve_pair_geometry(a)
    assert geom.row_perm is None
    # …but an explicit permutation must halve the raw strips (each octet
    # lands in one tile family instead of straddling both) and still
    # match the oracle through the un-permute epilogue
    perm = panel_spmm.choose_row_order(rows, cols, m, k)
    assert perm is not None
    plan_nat = pair_spmm.build_pair_plan(rows, cols, vals, (m, k))
    plan_perm = pair_spmm.build_pair_plan(rows, cols, vals, (m, k),
                                          row_perm=perm)
    assert plan_perm.n_strips * 2 == plan_nat.n_strips
    b = rng.uniform(-1, 1, (k, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(pair_spmm.spmm_pair(plan_perm, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_geometry(seed):
    # randomized geometry sweep: ragged shapes, random supertiling and
    # chunk sizes, optional row permutation — the pair plan's indexing is
    # all host-side integer arithmetic, so breadth here is cheap insurance
    rng = np.random.default_rng(1000 + seed)
    m = int(rng.integers(1, 700))
    k = int(rng.integers(1, 700))
    density = float(rng.uniform(0.001, 0.05))
    nnz = max(1, int(m * k * density))
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, k, nnz).astype(np.int32)
    vals = rng.uniform(-50, 50, nnz).astype(np.float32)
    a = COO(shape=(m, k), rows=rows, cols=cols, values=vals)
    n = int(rng.integers(1, 200))
    b = rng.uniform(-1, 1, (k, n)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)

    m_pad = -(-m // 8) * 8
    sm_choices = [None] + [s * 8 for s in (1, 2, 5) if s * 8 < m_pad]
    sm = sm_choices[int(rng.integers(0, len(sm_choices)))]
    ch = int(rng.choice([8, 16, 32]))
    perm = rng.permutation(m).astype(np.int64) if rng.random() < 0.5 else None
    plan = pair_spmm.build_pair_plan(rows, cols, vals, (m, k), sm=sm,
                                     chunk_strips=ch, row_perm=perm)
    out = np.asarray(pair_spmm.spmm_pair(plan, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol), (
        m, k, n, density, sm, ch, perm is not None)


def test_width_tiled_matches_oracle():
    # pin tile_n below the padded width: the plan re-streams per width
    # tile and each (st, nt) slab zero-inits independently
    a, _ = _rand_coo(200, 500, 0.02, seed=77)
    rng = np.random.default_rng(5)
    b = rng.uniform(-1, 1, (500, 200)).astype(np.float32)  # n_pad=256
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(pair_spmm.spmm_pair(a, b, interpret=True, tile_n=128))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_resolver_width_tiles_when_slab_too_wide():
    # a budget too small for even one supertile at full width must yield
    # a narrower tile_n instead of inadmissibility
    a, _ = _rand_coo(64, 256, 0.05, seed=9)
    budget = 300_000  # full width 512: b_bytes+acc alone exceed this
    geom = pair_spmm.resolve_pair_geometry(a, 512, budget_bytes=budget)
    assert geom is not None and geom.tile_n < 512
    assert 512 % geom.tile_n == 0 and geom.tile_n % 128 == 0
    assert pair_spmm.fits_vmem_pair(geom.sm, geom.tile_n, 8, 128,
                                    budget, geom.chunk_strips)
    rng = np.random.default_rng(6)
    b = rng.uniform(-1, 1, (256, 512)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(pair_spmm.spmm_pair(a, b, interpret=True,
                                         budget_bytes=budget))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_dispatch_serves_pair_when_panel_inadmissible():
    # a width whose full slab cannot hold even one panel supertile: the
    # panel resolver rejects, and dispatch must route to the width-tiled
    # pair kernel rather than fall back to the tile kernels
    from tpuspmm.config import Config
    from tpuspmm.kernels import dispatch, panel_spmm

    a, _ = _rand_coo(512, 600, 0.002, seed=51)
    rng = np.random.default_rng(4)
    b = rng.uniform(-1, 1, (600, 512)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    budget = 300_000
    assert panel_spmm.resolve_panel_geometry(
        a, 512, budget_bytes=budget,
        plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP) is None
    geom = pair_spmm.resolve_pair_geometry(a, 512, budget_bytes=budget)
    assert geom is not None and geom.tile_n < 512
    cfg = Config(interpret=True, vmem_budget_bytes=budget)
    out = np.asarray(dispatch.spmm_pallas(a, b, interpret=True, config=cfg))
    assert allclose(out, ref, cfg.rel_tol, cfg.abs_tol)
    # the pair path actually built a plan
    plans = getattr(a, "_plan_cache", {})
    assert any(k[0] == "pair" for k in plans), plans.keys()
