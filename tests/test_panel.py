"""Panel-kernel tests: plan-time block densification (kernels/panel_spmm).

The generic variant sweep (test_kernels.py) already drives pallas_panel
through the engine registry; this file covers the plan builder's edge
cases — padding strips, duplicate accumulation, caching, admission — and
the precision-mode tiers.
"""

import numpy as np
import pytest
import scipy.sparse

from tpuspmm.config import Config
from tpuspmm.formats import COO, convert
from tpuspmm.kernels import panel_spmm
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
    ((16, 128), 0.5),     # exactly one aligned strip
    ((8, 8), 1.0),        # smaller than one strip
])
def test_panel_matches_oracle(shape, density):
    a, sp = _rand_coo(*shape, density, seed=shape[0])
    rng = np.random.default_rng(1)
    b = rng.uniform(-1, 1, (shape[1], 70)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True))
    assert out.shape == ref.shape
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


@pytest.mark.parametrize("tm", [16, 32])
def test_panel_wide_strips_match_oracle(tm):
    """VERDICT r2 #3: larger strip heights (tm > 8) cut the per-panel
    slice-RMW chain; the kernel must stay exact for them, including the
    ragged-edge trash strip and supertiling."""
    a, _ = _rand_coo(257, 515, 0.03, seed=tm)
    rng = np.random.default_rng(2)
    b = rng.uniform(-1, 1, (515, 70)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    plan = panel_spmm.panel_plan_from_container(a, tm=tm)
    assert plan.tm == tm
    out = np.asarray(panel_spmm.spmm_panel(plan, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


@pytest.mark.parametrize("tm", [16, 32])
def test_panel_wide_strips_supertiled(tm):
    a, _ = _rand_coo(300, 420, 0.05, seed=3 + tm)
    rng = np.random.default_rng(5)
    b = rng.uniform(-1, 1, (420, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    plan = panel_spmm.panel_plan_from_container(a, tm=tm, sm=2 * tm)
    assert plan.n_supertiles > 1
    out = np.asarray(panel_spmm.spmm_panel(plan, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_geometry_search_considers_tm():
    """The joint (tm, P) search must pick a taller strip when the
    per-strip chain cost dominates and the rows cluster so the taller
    strip adds no plan bytes (contiguous dense rows are the extreme)."""
    m, k = 512, 256
    rows = np.repeat(np.arange(m, dtype=np.int64), 4)
    cols = np.tile(np.array([0, 64, 128, 200], np.int64), m)
    g = panel_spmm._geometry_search(
        rows, cols, m, k, (8, 16, 32), 128, (8, 16, 32, 64),
        strip_us=0.05, step_us=0.17, reorder=False)
    assert g is not None
    P, perm, sm, plan_bytes, tm, order_kind, tk, cost = g
    assert tm > 8, (tm, P, plan_bytes)
    # and with the chain uncharged, tm=8 (the base) must still win ties
    g0 = panel_spmm._geometry_search(
        rows, cols, m, k, (8, 16, 32), 128, (8, 16, 32, 64),
        strip_us=0.0, step_us=0.17, reorder=False)
    assert g0[4] == 8


def test_duplicate_coordinates_accumulate():
    # COO semantics: duplicates sum (reference/src/spmm/coo/spmm_coo_k1.cu:24)
    rows = np.array([0, 0, 3, 3, 3], np.int32)
    cols = np.array([1, 1, 2, 2, 2], np.int32)
    vals = np.array([1.0, 2.0, 10.0, -4.0, 1.0], np.float32)
    a = COO(shape=(5, 4), rows=rows, cols=cols, values=vals)
    b = np.eye(4, dtype=np.float32)
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True))
    assert out[0, 1] == pytest.approx(3.0)
    assert out[3, 2] == pytest.approx(7.0)
    assert np.count_nonzero(out) == 2


def test_empty_matrix():
    a = COO(shape=(20, 40), rows=np.zeros(0, np.int32),
            cols=np.zeros(0, np.int32), values=np.zeros(0, np.float32))
    b = np.ones((40, 8), np.float32)
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True))
    assert out.shape == (20, 8)
    assert not out.any()


def test_plan_cached_on_container():
    a, _ = _rand_coo(64, 256, 0.05, seed=7)
    p1 = panel_spmm.panel_plan_from_container(a)
    p2 = panel_spmm.panel_plan_from_container(a)
    assert p1 is p2
    # different geometry → different plan
    p3 = panel_spmm.panel_plan_from_container(a, tm=32)
    assert p3 is not p1 and p3.tm == 32


def test_plan_structure():
    a, sp = _rand_coo(100, 300, 0.02, seed=3)
    plan = panel_spmm.panel_plan_from_container(a)
    # kt sorted ascending → each B k-tile fetched once
    assert (np.diff(plan.kt) >= 0).all()
    # every real strip offset is tm-aligned and in range; padding strips
    # point at the trash strip m_pad
    offs = plan.offs.ravel()
    assert ((offs % plan.tm) == 0).all()
    assert (offs <= plan.m_pad).all()
    # densified mass equals the triplet mass
    assert plan.a_dense.sum() == pytest.approx(float(sp.tocoo().data.sum()), rel=1e-5)


def test_split_mode_is_verified_only_tier():
    # ~2^-16 relative: may breach the abs gate under cancellation, so the
    # registry marks it verified_only; on a benign matrix it passes.
    a, _ = _rand_coo(64, 256, 0.05, seed=11)
    rng = np.random.default_rng(2)
    b = rng.uniform(-1, 1, (256, 32)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True, mode="split2"))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)
    from tpuspmm.engine.registry import get_engine

    v = {v.name: v for v in get_engine("csr").variants}
    assert v["pallas_panel_split"].verified_only
    assert not v["pallas_panel"].verified_only


def test_bf16_ingested_b():
    a, _ = _rand_coo(64, 256, 0.05, seed=13)
    rng = np.random.default_rng(5)
    b32 = rng.uniform(-1, 1, (256, 32)).astype(np.float32)
    import jax.numpy as jnp

    b16 = jnp.asarray(b32, dtype=jnp.bfloat16)
    ref = oracle.spmm_oracle(a, np.asarray(b16, np.float32))
    out = np.asarray(panel_spmm.spmm_panel(a, b16, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_vmem_admission_raises():
    # a budget too small for even one output strip + streaming buffers
    # must be refused, not mis-run
    a, _ = _rand_coo(64, 128, 0.1, seed=17)
    b = np.ones((128, 8), np.float32)
    with pytest.raises(ValueError):
        panel_spmm.spmm_panel(a, b, interpret=True, budget_bytes=1024)


def test_device_cache_survives_tracing():
    # regression: a first call under an outer trace (e.g. the chained
    # device timer) must not cache trace-scoped tracers on the plan —
    # later traces would hit UnexpectedTracerError
    import jax

    a, _ = _rand_coo(64, 256, 0.05, seed=31)
    b = np.ones((256, 32), np.float32)
    f = jax.jit(lambda bb: panel_spmm.spmm_panel(a, bb, interpret=True))
    f(b)  # first use happens inside a trace
    g = jax.jit(lambda bb: panel_spmm.spmm_panel(a, bb, interpret=True) + 1)
    g(b)  # a second, different trace must not see leaked tracers
    # eager call afterwards still works and may now cache concrete arrays
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True))
    assert out.shape == (64, 32)


def test_supertiled_matches_oracle():
    # output larger than the budget → row supertiling (n_st > 1); the
    # budget below only fits a P=8 panel buffer, so admission degrades P
    # and supertiles the 600 padded rows
    a, _ = _rand_coo(600, 300, 0.01, seed=23)
    rng = np.random.default_rng(3)
    b = rng.uniform(-1, 1, (300, 70)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    budget = 340_000
    sm = panel_spmm.pick_supertile_rows(600, 128, 8, 128,
                                        budget_bytes=budget,
                                        panel_strips=8)
    assert sm is not None and 8 <= sm < 600
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True,
                                           budget_bytes=budget))
    assert out.shape == ref.shape
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_supertiled_empty_supertile_is_zero():
    # rows 200..399 empty: with sm small enough, at least one supertile
    # has no nonzeros — its slab must still come back zeroed
    rows = np.array([0, 1, 599], np.int32)
    cols = np.array([0, 5, 120], np.int32)
    vals = np.array([2.0, 3.0, 4.0], np.float32)
    a = COO(shape=(600, 128), rows=rows, cols=cols, values=vals)
    b = np.eye(128, dtype=np.float32)
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True,
                                           budget_bytes=340_000))
    assert out[0, 0] == pytest.approx(2.0)
    assert out[1, 5] == pytest.approx(3.0)
    assert out[599, 120] == pytest.approx(4.0)
    assert np.count_nonzero(out) == 3


def test_row_reordering_triggers_and_matches_oracle():
    # even rows hit k-tile 0, odd rows k-tile 3: natural octets straddle
    # both tiles (2 strips each) while a centroid sort separates them
    # (1 strip each) — the ordering chooser must find the perm (gather
    # uncharged here; on-chip the dispatch-table perm_us gates it) and
    # the un-permuted output must still match the oracle
    rng = np.random.default_rng(43)
    m, k, per_row = 512, 512, 6
    rows = np.repeat(np.arange(m, dtype=np.int32), per_row)
    cols = np.where(
        (rows % 2) == 0,
        rng.integers(0, 128, m * per_row),
        rng.integers(384, 512, m * per_row)).astype(np.int32)
    vals = rng.uniform(-10, 10, m * per_row).astype(np.float32)
    a = COO(shape=(m, k), rows=rows, cols=cols, values=vals)
    perm = panel_spmm.choose_row_order(rows, cols, m, k)
    assert perm is not None
    plan = panel_spmm.build_panel_plan(rows, cols, vals, (m, k),
                                       row_perm=perm)
    unordered = panel_spmm.panel_plan_from_container(a, reorder_rows=False)
    assert plan.plan_bytes < unordered.plan_bytes
    b = rng.uniform(-1, 1, (k, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(panel_spmm.spmm_panel(plan, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)
    # supertiled + reordered together
    plan2 = panel_spmm.build_panel_plan(rows, cols, vals, (m, k),
                                        row_perm=perm, sm=128,
                                        panel_strips=8)
    out2 = np.asarray(panel_spmm.spmm_panel(plan2, b, interpret=True,
                                            budget_bytes=330_000))
    assert allclose(out2, ref, CFG.rel_tol, CFG.abs_tol)
    # with the on-chip gather charge, a tiny matrix must NOT reorder
    geom = panel_spmm.choose_panel_geometry(rows, cols, m, k,
                                            perm_us=1e6)
    assert geom[1] is None


def test_signature_order_clusters_multi_tile_rows():
    # rows come in two interleaved families, each touching a distinct
    # PAIR of k-tiles with identical centroids — the centroid and
    # first-tile sorts cannot separate family A (tiles 0 and 3) from
    # family B (tiles 0 and 5) but the k-tile-signature sort can
    rng = np.random.default_rng(17)
    m, k, per_tile = 512, 768, 3
    fam = np.arange(m) % 2
    second = np.where(fam == 0, 3, 5)
    rows = np.repeat(np.arange(m, dtype=np.int64), 2 * per_tile)
    tiles = np.stack([np.zeros(m, np.int64), second], 1)
    tile_of = np.repeat(tiles, per_tile, axis=1).reshape(-1)
    cols = tile_of * 128 + rng.integers(0, 128, m * 2 * per_tile)
    perms = panel_spmm._order_candidates(rows, cols, m, cols // 128)
    assert len(perms) == 3
    for p in perms:
        assert sorted(p.tolist()) == list(range(m))
    sig = perms[2]
    # in signature order the two families are contiguous
    assert (np.diff(fam[sig]) != 0).sum() == 1
    # and the plan the chooser builds from it is smaller than natural
    nkt = -(-k // 128)
    nat, _ = panel_spmm._st_strip_counts(rows, cols // 128, nkt, 8, 10**9)
    inv = np.empty(m, np.int64)
    inv[sig] = np.arange(m)
    ordered, _ = panel_spmm._st_strip_counts(inv[rows], cols // 128, nkt,
                                             8, 10**9)
    assert (panel_spmm._padded_strips(ordered, 16)
            < panel_spmm._padded_strips(nat, 16))


def test_auto_geometry_prefers_large_p_when_step_bound():
    # 64 octets per k-tile: padding is identical at every P ≤ 64, so the
    # cost model must take the largest P (fewest grid steps)
    rng = np.random.default_rng(7)
    m, k = 8192, 2048   # 1024 octets, 16 k-tiles, 64 octets each
    rows = np.arange(m, dtype=np.int64)
    cols = (rows // 512) * 128 + rng.integers(0, 128, m)
    P, perm = panel_spmm.choose_panel_geometry(rows, cols, m, k)
    assert P == max(panel_spmm.STRIP_CANDIDATES)
    # plan-bandwidth-bound shape: huge plan, few panels per k-tile —
    # larger P only adds padding, the chooser must keep P small
    rows2 = np.repeat(np.arange(m, dtype=np.int64), 16)
    cols2 = rng.integers(0, k, m * 16)
    P2, _ = panel_spmm.choose_panel_geometry(rows2, cols2, m, k,
                                             step_us=0.0)
    assert P2 <= 16


def test_admit_panel_degrades_p_under_tight_budget():
    # resolved P=64 (scattered), but the budget only fits a P≤16 panel
    # buffer: admission must shrink P, not refuse
    rng = np.random.default_rng(11)
    m, k = 8192, 2048
    rows = np.arange(m, dtype=np.int32)
    cols = ((rows // 512) * 128 + rng.integers(0, 128, m)).astype(np.int32)
    vals = rng.uniform(-1, 1, m).astype(np.float32)
    a = COO(shape=(m, k), rows=rows, cols=cols, values=vals)
    P, _ = panel_spmm.resolve_panel_strips(a)
    assert P == max(panel_spmm.STRIP_CANDIDATES)
    budget = 400_000  # P=64 buffer alone is 512 KiB
    adm = panel_spmm.admit_panel(a, 128, budget_bytes=budget)
    assert adm is not None
    strips_arg, sm_arg = adm
    assert strips_arg is not None and strips_arg < 64
    b = rng.uniform(-1, 1, (k, 8)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True,
                                           budget_bytes=budget))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)


def test_flat_offs_layout_matches_2d():
    # plans past ~1800 panels overflow the 1 MiB SMEM with the 2-D offs
    # layout (trailing dim padded to 128 lanes) and switch to a flat 1-D
    # layout; pin BOTH layouts on one small supertiled plan (padding
    # strips + trash strip in play) and require identical output
    import jax.numpy as jnp

    from tpuspmm.kernels.common import pad_b, round_up
    from tpuspmm.ops.xla import coo_view

    a, _ = _rand_coo(300, 400, 0.02, seed=5)
    rng = np.random.default_rng(2)
    b = rng.uniform(-1, 1, (400, 50)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    coo = coo_view(a)
    plan = panel_spmm.build_panel_plan(
        np.asarray(coo.rows), np.asarray(coo.cols), np.asarray(coo.values),
        coo.shape, panel_strips=8, sm=128)
    assert plan.n_supertiles > 1
    n_pad = round_up(b.shape[1], 128)
    bp = pad_b(jnp.asarray(b), plan.num_k_tiles * plan.tk, n_pad)
    outs = []
    for flat in (False, True):
        raw = np.asarray(panel_spmm._panel_spmm(
            plan.kt, plan.st, plan.offs, plan.a_dense, bp,
            tm=plan.tm, tk=plan.tk, panel_strips=plan.panel_strips,
            sm=plan.sm, n_st=plan.n_supertiles, interpret=True,
            flat_offs=flat))
        slab = raw.reshape(plan.n_supertiles, plan.sm + plan.tm, n_pad)
        outs.append(slab[:, :plan.sm, :].reshape(-1, n_pad)[:300, :50])
    assert allclose(outs[0], ref, CFG.rel_tol, CFG.abs_tol)
    np.testing.assert_array_equal(outs[0], outs[1])


def test_dispatch_serves_supertiled_panel():
    # a large-M, hyper-sparse problem whose output exceeds a small VMEM
    # budget must still route to the panel kernel (supertiled), not fall
    # back — and produce the right answer
    from tpuspmm.config import Config
    from tpuspmm.kernels import dispatch

    a, _ = _rand_coo(600, 300, 0.002, seed=41)
    rng = np.random.default_rng(9)
    b = rng.uniform(-1, 1, (300, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    cfg = Config(interpret=True, vmem_budget_bytes=340_000)
    out = np.asarray(dispatch.spmm_pallas(a, b, interpret=True, config=cfg))
    assert allclose(out, ref, cfg.rel_tol, cfg.abs_tol)
    # the admission path actually built a supertiled plan
    plans = getattr(a, "_plan_cache", {})
    assert any(k[0] == "panel" and k[4] is not None for k in plans), plans.keys()


def _pm1_coo(m, k, per_row, seed=0):
    """±1-valued matrix (incidence/boundary-matrix shaped — the three
    large corpus cases n4c6-b13, ch7-6-b5, GL7d25 are all ±1)."""
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(m, dtype=np.int32), per_row)
    cols = rng.integers(0, k, m * per_row).astype(np.int32)
    vals = rng.choice([-1.0, 1.0], m * per_row).astype(np.float32)
    return COO(shape=(m, k), rows=rows, cols=cols, values=vals)


def test_plan_compacts_to_bf16_when_lossless():
    import ml_dtypes

    a = _pm1_coo(100, 300, 4, seed=3)
    plan = panel_spmm.panel_plan_from_container(a)
    assert plan.a_dense.dtype == ml_dtypes.bfloat16
    # plan_bytes (the admission/cost input) reflects the halved stream —
    # compare at the SAME geometry (the auto pick may choose tm/tk/P)
    f32_plan = panel_spmm.build_panel_plan(
        np.asarray(a.rows), np.asarray(a.cols),
        np.asarray(a.values) * np.float32(0.1003),  # not bf16-exact
        a.shape, tm=plan.tm, tk=plan.tk, panel_strips=plan.panel_strips,
        sm=plan.sm)
    assert f32_plan.a_dense.dtype == np.float32
    assert plan.plan_bytes * 2 <= f32_plan.plan_bytes
    # gate-exact serving through the 3-term-B path
    rng = np.random.default_rng(5)
    b = rng.uniform(-1, 1, (300, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol)
    # split tier (2 bf16 passes of B) stays within the gate on benign data
    out_s = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True,
                                             mode="split2"))
    assert allclose(out_s, ref, CFG.rel_tol, CFG.abs_tol)
    # bf16-ingested B against a bf16 plan: single-pass, exact given inputs
    import jax.numpy as jnp

    b16 = jnp.asarray(b, dtype=jnp.bfloat16)
    ref16 = oracle.spmm_oracle(a, np.asarray(b16, np.float32))
    out16 = np.asarray(panel_spmm.spmm_panel(a, b16, interpret=True))
    assert allclose(out16, ref16, CFG.rel_tol, CFG.abs_tol)


def test_inexact_duplicate_sum_keeps_f32_plan():
    # each value round-trips bf16, but their SUM (257 = 2^8+1) does not —
    # the shared dedupe-aware predicate must say f32, and the built plan
    # must agree (admission and build price the same dtype)
    rows = np.array([0, 0], np.int32)
    cols = np.array([1, 1], np.int32)
    vals = np.array([256.0, 1.0], np.float32)
    a = COO(shape=(8, 128), rows=rows, cols=cols, values=vals)
    assert panel_spmm.values_bf16_exact(vals)  # raw values look exact…
    assert not panel_spmm.plan_values_bf16_exact(rows, cols, vals, 128)
    plan = panel_spmm.panel_plan_from_container(a)
    assert plan.a_dense.dtype == np.float32    # …but the plan stays f32
    b = np.eye(128, dtype=np.float32)
    out = np.asarray(panel_spmm.spmm_panel(a, b, interpret=True))
    assert out[0, 1] == 257.0


def test_sharded_panel_plan_unifies_dtype():
    import ml_dtypes

    from tpuspmm.parallel import shard

    a = _pm1_coo(64, 256, 4, seed=9)
    sp = shard.shard_rows_panelplan(a, 4)
    assert sp.a_dense.dtype == ml_dtypes.bfloat16
    # poison one shard's exactness: rows 0..15 land in shard 0
    vals = np.asarray(a.values).copy()
    vals[0] = 0.1003
    a2 = COO(shape=a.shape, rows=a.rows, cols=a.cols, values=vals)
    sp2 = shard.shard_rows_panelplan(a2, 4)
    assert sp2.a_dense.dtype == np.float32


def test_supertiled_plan_structure():
    a, _ = _rand_coo(600, 300, 0.02, seed=29)
    plan = panel_spmm.panel_plan_from_container(a, sm=144)
    assert plan.n_supertiles == 5
    # supertiles ascending; every supertile present (zero-init coverage)
    assert (np.diff(plan.st) >= 0).all()
    assert set(plan.st.tolist()) == set(range(5))
    # kt sorted within each supertile → B tiles fetched once per supertile
    for s in range(5):
        kts = plan.kt[plan.st == s]
        assert (np.diff(kts) >= 0).all()
    # offsets local: multiples of tm, at most the local trash strip sm
    offs = plan.offs.ravel()
    assert ((offs % plan.tm) == 0).all()
    assert (offs <= plan.sm).all()


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_random_panel_geometry(seed):
    """Randomized joint-geometry sweep over the panel kernel: ragged
    shapes, tm ∈ {8,16,32}, random P / supertiling / row permutation —
    the tm>8 paths are exercised on-chip by bench/ablate_panel, so
    breadth here is cheap insurance against a geometry-specific indexing
    bug surfacing mid-measurement."""
    rng = np.random.default_rng(2000 + seed)
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

    tm = int(rng.choice([8, 16, 32]))
    m_pad = -(-m // tm) * tm
    sm_choices = [None] + [s * tm for s in (1, 2, 5) if s * tm < m_pad]
    sm = sm_choices[int(rng.integers(0, len(sm_choices)))]
    P = int(rng.choice([8, 16, 32]))
    perm = rng.permutation(m).astype(np.int64) if rng.random() < 0.5 else None
    plan = panel_spmm.build_panel_plan(rows, cols, vals, (m, k), tm=tm,
                                       panel_strips=P, sm=sm, row_perm=perm)
    out = np.asarray(panel_spmm.spmm_panel(plan, b, interpret=True))
    assert allclose(out, ref, CFG.rel_tol, CFG.abs_tol), (
        m, k, n, density, tm, sm, P, perm is not None)


def test_geometry_disk_cache_roundtrip(tmp_path, monkeypatch):
    """A second process (fresh container, same digest) must reconstruct
    the identical geometry — including the m-sized row permutation,
    rebuilt from the stored order KIND — without re-running the search."""
    import json

    monkeypatch.setenv("TPUSPMM_GEOM_CACHE", str(tmp_path / "geom.json"))
    a, _ = _rand_coo(600, 900, 0.01, seed=42)
    g1 = panel_spmm.resolve_panel_geometry(a, 256)
    assert g1 is not None
    data = json.load(open(tmp_path / "geom.json"))
    assert len(data) == 1
    (entry,) = data.values()
    assert entry["order"] in ("natural",) + panel_spmm.ORDER_KINDS

    # fresh container (no in-memory cache), same digest: disk hit
    searched = []
    orig = panel_spmm._geometry_search
    monkeypatch.setattr(panel_spmm, "_geometry_search",
                        lambda *a_, **k_: searched.append(1) or orig(*a_, **k_))
    a2 = COO(shape=a.shape, rows=np.asarray(a.rows).copy(),
             cols=np.asarray(a.cols).copy(),
             values=np.asarray(a.values).copy())
    g2 = panel_spmm.resolve_panel_geometry(a2, 256)
    assert not searched  # served from disk, search never ran
    assert (g2.panel_strips, g2.sm, g2.plan_bytes, g2.tm, g2.order_kind,
            g2.tk) == \
        (g1.panel_strips, g1.sm, g1.plan_bytes, g1.tm, g1.order_kind, g1.tk)
    if g1.row_perm is None:
        assert g2.row_perm is None
    else:
        np.testing.assert_array_equal(g1.row_perm, g2.row_perm)
    # and the reconstructed geometry serves a correct result
    rng = np.random.default_rng(1)
    b = rng.uniform(-1, 1, (a.shape[1], 64)).astype(np.float32)
    plan = panel_spmm.panel_plan_from_geometry(a2, g2)
    out = np.asarray(panel_spmm.spmm_panel(plan, b, interpret=True))
    assert allclose(out, oracle.spmm_oracle(a, b), CFG.rel_tol, CFG.abs_tol)


@pytest.mark.parametrize("tk", [256, 512])
def test_panel_wide_ktile_correct(tk):
    """tk > 128 plans (fewer grid steps, wider strips) must serve the
    same result: the kernel's B block becomes (tk, n_pad) and B is padded
    to num_k_tiles*tk."""
    a, _ = _rand_coo(200, 700, 0.02, seed=7)
    rng = np.random.default_rng(2)
    b = rng.uniform(-1, 1, (a.shape[1], 64)).astype(np.float32)
    geom = panel_spmm.resolve_panel_geometry(a, 128, tk=tk)
    assert geom is not None and geom.tk == tk
    plan = panel_spmm.panel_plan_from_geometry(a, geom)
    assert plan.tk == tk
    out = np.asarray(panel_spmm.spmm_panel(plan, b, interpret=True))
    assert allclose(out, oracle.spmm_oracle(a, b), CFG.rel_tol, CFG.abs_tol)


def test_geometry_search_tk_tradeoff():
    """The joint search must pick a wider k-tile only when the modelled
    step/strip savings beat the extra plan bandwidth: with per-step cost
    dominating, tk=256 (half the steps) should win; with bandwidth
    dominating (huge step-free budget), tk=128 should hold."""
    a, _ = _rand_coo(512, 2048, 0.01, seed=3)
    from tpuspmm.ops.xla import coo_view

    coo = coo_view(a)
    rows = np.asarray(coo.rows, np.int64)
    cols = np.asarray(coo.cols, np.int64)
    g_step = panel_spmm._geometry_search(
        rows, cols, 512, 2048, 8, (128, 256), (16,),
        step_us=100.0, strip_us=0.0, hbm_gbps=1e9, reorder=False)
    assert g_step[6] == 256  # steps dominate -> wider tiles
    g_bw = panel_spmm._geometry_search(
        rows, cols, 512, 2048, 8, (128, 256), (16,),
        step_us=0.0, strip_us=0.0, hbm_gbps=1.0, reorder=False)
    assert g_bw[6] == 128  # bandwidth dominates -> denser plan
