"""Engine-layer tests: format selection, dispatch routing, API surface."""

import numpy as np
import pytest

from tpuspmm.formats import CSR, COO, BSR, ELL, convert
from tpuspmm.engine import select
from tpuspmm.engine.registry import get_engine, FORMATS
from tpuspmm.ops import oracle
from tpuspmm.utils.compare import allclose
import tpuspmm


@pytest.fixture(scope="module")
def small():
    rng = np.random.default_rng(0)
    a = CSR.random(150, 220, 0.05, seed=1)
    b = rng.standard_normal((220, 48)).astype(np.float32)
    return a, b, oracle.spmm_oracle(a, b)


def test_engines_exist_with_reference_variant_counts():
    """Reference: CSR=4, COO=1, BSR=1, ELL=1 kernels (SURVEY.md §2.1 N3);
    this build must have at least that many per format."""
    mins = {"csr": 4, "coo": 1, "bsr": 1, "ell": 1}
    for fmt in FORMATS:
        assert get_engine(fmt).num_kernels >= mins[fmt]


def test_run_kernel_numbering(small):
    """-1 = vendor, 0 = oracle, 1..N = variants (engine.cpp:16-61)."""
    a, b, ref = small
    eng = get_engine("csr")
    assert allclose(np.asarray(eng.run_kernel(0, a, b)), ref, 1e-6, 1e-6)
    assert allclose(np.asarray(eng.run_kernel(-1, a, b)), ref, 1e-2, 1e-3)
    for v in eng.variants:
        if v.verified_only:
            continue  # gate-checked serving paths only (see test_kernels)
        if v.admissible is None or v.admissible(a, b, tpuspmm.default_config()):
            out = np.asarray(eng.run_kernel(v.number, a, b))
            assert allclose(out, ref, 1e-2, 1e-3), v.name


def test_select_format_block_structure():
    a = BSR.random_blocks(256, 256, (128, 128), 0.3, seed=0).to_csr()
    fmt, kernel = select.select_format(a)
    assert fmt == "bsr"


def test_select_format_hyper_sparse():
    a = CSR.random(2000, 3000, 0.0005, seed=2)
    fmt, kernel = select.select_format(a)
    assert fmt in ("csr", "ell")


def test_auto_spmm_correct(small):
    a, b, ref = small
    out, fmt, kernel = select.auto_spmm(a, b)
    assert fmt in FORMATS
    assert allclose(np.asarray(out), ref, 1e-2, 1e-3)


def test_dispatch_routes_densify():
    """Moderate density + affordable dense A → densify path."""
    from tpuspmm.kernels import dispatch

    a = CSR.random(256, 256, 0.05, seed=3)
    b = np.random.default_rng(0).standard_normal((256, 32)).astype(np.float32)
    out = np.asarray(dispatch.spmm_pallas(a, b))
    assert allclose(out, oracle.spmm_oracle(a, b), 1e-2, 1e-3)


def test_dispatch_routes_hyper_sparse_to_xla():
    from tpuspmm.kernels import dispatch

    a = CSR.random(500, 4000, 0.0008, seed=4)
    b = np.random.default_rng(1).standard_normal((4000, 16)).astype(np.float32)
    out = np.asarray(dispatch.spmm_pallas(a, b))
    assert allclose(out, oracle.spmm_oracle(a, b), 1e-2, 1e-3)


def test_spmv(small):
    a, b, ref = small
    x = b[:, 0]
    out = np.asarray(tpuspmm.spmv(a, x, method="xla"))
    assert out.shape == (a.shape[0],)
    assert allclose(out[:, None], ref[:, [0]], 1e-2, 1e-3)


def test_spmm_transpose(small):
    a, b, ref = small
    g = np.random.default_rng(5).standard_normal((a.shape[0], 8)).astype(np.float32)
    expect = a.to_dense().T.astype(np.float64) @ g
    for method in ("xla", "pallas"):  # backward must not downgrade off Pallas
        out = np.asarray(tpuspmm.spmm_transpose(a, g, method=method))
        assert allclose(out, expect, 1e-2, 1e-3), method


def test_spmm_fn_pallas_gradient():
    """spmm_fn's VJP runs the Pallas machinery end-to-end (VERDICT r1
    item 5: the backward path must not silently fall back to the
    gather-bound XLA path)."""
    import jax
    import jax.numpy as jnp

    a = CSR.random(200, 300, 0.05, seed=15, lo=-1, hi=1)
    b0 = np.random.default_rng(8).standard_normal((300, 32)).astype(np.float32)
    f = tpuspmm.spmm_fn(a, method="pallas")
    tgt = np.random.default_rng(9).standard_normal((200, 32)).astype(np.float32)

    def loss(b):
        r = f(b) - tgt
        return 0.5 * jnp.sum(r * r)

    g = np.asarray(jax.grad(loss)(jnp.asarray(b0)))
    ad = a.to_dense().astype(np.float64)
    res = ad @ b0 - tgt
    assert allclose(g, ad.T @ res, 1e-2, 1e-3)


def test_public_api_formats_round_trip(small):
    a, b, ref = small
    for fmt in FORMATS:
        m = convert.to_format(a, fmt)
        out = np.asarray(tpuspmm.spmm(m, b, method="xla"))
        assert allclose(out, ref, 1e-2, 1e-3), fmt


def test_timing_module_cpu():
    """device_time_ms chains correctly on the CPU backend."""
    import jax.numpy as jnp

    from tpuspmm.utils import timing

    w = jnp.ones((64, 64))
    ms = timing.device_time_ms(
        lambda b: jnp.dot(w, b, preferred_element_type=jnp.float32),
        jnp.ones((64, 64)), iters=4, repeats=2,
    )
    assert ms > 0


def test_timing_module_bf16_operand():
    """The timing chain must be type-stable for a bf16-ingested operand
    (--b-dtype bf16): the carried perturbation `b0 + ds` once promoted
    the bf16 carry to f32 and fori_loop rejected the signature — only on
    paths that call device_time_ms (i.e. real-TPU sweeps), invisible to
    the CPU engine tests."""
    import jax.numpy as jnp

    from tpuspmm.utils import timing

    w = jnp.ones((64, 64), jnp.bfloat16)
    ms = timing.device_time_ms(
        lambda b: jnp.dot(w, b, preferred_element_type=jnp.float32),
        jnp.ones((64, 64), jnp.bfloat16), iters=4, repeats=2,
    )
    assert ms > 0


def test_spmm_fn_gradient_matches_dense():
    import jax
    import jax.numpy as jnp

    a = CSR.random(60, 80, 0.1, seed=6)
    b0 = np.random.default_rng(2).standard_normal((80, 16)).astype(np.float32)
    f = tpuspmm.spmm_fn(a, method="xla")
    tgt = np.random.default_rng(3).standard_normal((60, 16)).astype(np.float32)

    def loss(b):
        r = f(b) - tgt
        return 0.5 * jnp.sum(r * r)

    g = np.asarray(jax.grad(loss)(jnp.asarray(b0)))
    ad = a.to_dense().astype(np.float64)
    g_ref = ad.T @ (ad @ b0 - tgt)
    # framework gate tolerance (f32 forward/backward vs f64 reference,
    # A values span ±100 so absolute magnitudes are large)
    assert allclose(g, g_ref, 1e-2, 1e-3)


def test_runner_device_fault_aborts_engine(monkeypatch, small):
    """An UNAVAILABLE device error must flag the record and stop the run
    (a poisoned client fails every subsequent call slowly)."""
    from tpuspmm.engine.runner import run_engine
    from tpuspmm.engine.registry import Engine, KernelVariant

    a, b, _ = small

    def boom(a_, b_, cfg):
        raise RuntimeError("UNAVAILABLE: TPU device error")

    def never(a_, b_, cfg):
        raise AssertionError("must not run after a device fault")

    eng = Engine(fmt="csr", variants=[
        KernelVariant(1, "boom", boom),
        KernelVariant(2, "never", never),
    ])
    records = run_engine(eng, a, b, testcase="t", repeats=1, emit=False)
    fault = [r for r in records if r.get("device_fault") == "1"]
    assert len(fault) == 1 and fault[0]["kernelName"] == "boom"
    assert not any(r.get("kernelName") == "never" for r in records)
    assert not any(r.get("kernelType") == "-1" for r in records)


def test_runner_fault_is_errored_not_incorrect(small):
    """VERDICT r3 #3: an exception during a variant run (OOM, wedge) must
    produce correct:"" + error — never correct:"0", which the reference
    reserves for a completed allclose miss (spmm_csr_k1.cu:76-81) — and
    summarize must tally it in its own `errored` column, not `incorrect`."""
    from bench.summarize import summarize
    from tpuspmm.engine.registry import Engine, KernelVariant
    from tpuspmm.engine.runner import run_engine

    a, b, _ = small

    def boom(a_, b_, cfg):
        raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")

    eng = Engine(fmt="csr", variants=[KernelVariant(1, "boom", boom)])
    records = run_engine(eng, a, b, testcase="t", repeats=1, emit=False,
                         run_vendor=False)
    rec = next(r for r in records if r["kernelName"] == "boom")
    assert rec["correct"] == "", rec
    assert "RESOURCE_EXHAUSTED" in rec["error"]
    rows = summarize(records)
    row = next(r for r in rows if r["testcase"] == "t")
    assert row["errored"] == 1
    assert row["incorrect"] == 0


def test_autotune_picks_and_caches(small):
    from tpuspmm.engine import autotune

    a, b, ref = small
    ranking = autotune.tune(a, b, iters=2)
    assert ranking, "no variant tuned"
    assert hasattr(a, "_tune_cache") and a._tune_cache
    out = np.asarray(tpuspmm.spmm(a, b, method="tuned"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_autotune_excludes_gate_failing_variants():
    """verified_only variants (2-term bf16 splits) may be faster but are
    not numerically guaranteed; tune() must drop any variant whose result
    fails the oracle gate for this (matrix, operand)."""
    from tpuspmm.engine import autotune

    a = CSR.random(300, 511, 0.15, seed=811)  # U(-100,100) values: split2 fails
    b = np.random.default_rng(7).uniform(-1, 1, (511, 96)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    from tpuspmm.config import default_config

    cfg = default_config()
    ranking = autotune.tune(a, b, iters=1, use_disk_cache=False)
    assert ranking
    engine = get_engine("csr")
    for r in ranking:
        out = np.asarray(engine.run_kernel(r.number, a, b, cfg))
        assert allclose(out, ref, 1e-2, 1e-3), (
            f"tune ranked a gate-failing variant: {r.variant_name}")


def test_autotune_measures_geometry_candidates_and_pins():
    """tune() must measure the cost model's top panel/pair geometry
    candidates on device and PIN the measured winner, so serving
    dispatches what measured fastest, not what the model guessed
    (VERDICT r3 #1: the round-3 driver served a 0.141 ms geometry while
    the model's own #2 candidate measured 0.064 ms on the same chip).
    The ranking entries must carry geometry provenance for the bench
    record (weak #7)."""
    from tpuspmm.config import default_config
    from tpuspmm.engine import autotune
    from tpuspmm.kernels import panel_spmm
    from tpuspmm.kernels.common import round_up

    a = CSR.random(256, 384, 0.08, seed=21)
    b = np.random.default_rng(3).standard_normal((384, 64)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    cfg = default_config()
    ranking = autotune.tune(a, b, iters=1, use_disk_cache=False)
    by_name = {r.variant_name: r for r in ranking}
    for name, family in autotune._GEOM_FAMILIES.items():
        r = by_name.get(name)
        if r is not None:
            assert r.geom is not None and r.geom["family"] == family, name
    panel_entry = by_name.get("pallas_panel")
    assert panel_entry is not None, "panel variant missing from ranking"
    # the measured winner is pinned: the serving-path resolver key now
    # returns exactly the geometry the ranking's ms was measured at
    n_pad = round_up(b.shape[1], 128)
    g = panel_spmm.resolve_panel_geometry(
        a, n_pad, panel_strips=cfg.panel_strips,
        budget_bytes=cfg.vmem_budget_bytes,
        plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
    assert (g.tm, g.panel_strips, g.tk, g.order_kind) == (
        panel_entry.geom["tm"], panel_entry.geom["P"],
        panel_entry.geom["tk"], panel_entry.geom["order"])
    out = np.asarray(tpuspmm.spmm(a, b, method="tuned"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_geometry_candidates_lead_with_resolver_pick():
    """Candidate #0 of the enumerators must be the plain resolver's
    hysteresis winner — so a K=1 sweep degenerates to exactly the old
    behaviour — and candidates must be distinct geometries."""
    from tpuspmm.kernels import pair_spmm, panel_spmm
    from tpuspmm.kernels.common import round_up

    a = CSR.random(512, 640, 0.04, seed=33)
    n_pad = round_up(96, 128)
    budget = 8 * 1024 * 1024
    cands = panel_spmm.resolve_panel_geometry_candidates(
        a, n_pad, k=3, budget_bytes=budget,
        plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
    assert cands, "no panel candidates"
    plain = panel_spmm.resolve_panel_geometry(
        a, n_pad, budget_bytes=budget,
        plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
    g0 = cands[0]
    assert (g0.tm, g0.panel_strips, g0.tk, g0.sm, g0.order_kind) == (
        plain.tm, plain.panel_strips, plain.tk, plain.sm, plain.order_kind)
    idents = [(g.tm, g.panel_strips, g.tk, g.sm, g.order_kind)
              for g in cands]
    assert len(set(idents)) == len(idents)

    pcands = pair_spmm.resolve_pair_geometry_candidates(
        a, n_pad, k=3, budget_bytes=budget,
        plan_bytes_cap=pair_spmm.PLAN_BYTES_CAP)
    assert pcands, "no pair candidates"
    pplain = pair_spmm.resolve_pair_geometry(
        a, n_pad, budget_bytes=budget,
        plan_bytes_cap=pair_spmm.PLAN_BYTES_CAP)
    p0 = pcands[0]
    assert (p0.sm, p0.chunk_strips, p0.tile_n, p0.order_kind) == (
        pplain.sm, pplain.chunk_strips, pplain.tile_n, pplain.order_kind)
    pidents = [(g.sm, g.chunk_strips, g.tile_n, g.order_kind)
               for g in pcands]
    assert len(set(pidents)) == len(pidents)


def test_tuned_serving_skips_verified_only_by_default():
    """A verified_only tier's tune-time gate pass proves nothing about
    future operands of the same width, so spmm_tuned must not serve one
    unless the caller opts in (and the ranking must carry the flag so
    disk-cached rankings stay safe too)."""
    from tpuspmm.engine import autotune

    a = CSR.random(64, 96, 0.2, seed=3)
    b = np.random.default_rng(5).uniform(-1, 1, (96, 32)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    ranking = autotune.tune(a, b, iters=1, use_disk_cache=False)
    assert ranking
    engine = get_engine("csr")
    flagged = {v.name for v in engine.variants if v.verified_only}
    for r in ranking:
        assert r.verified_only == (r.variant_name in flagged), r
    # force a verified_only entry to rank first; default serving must
    # skip it, opt-in must serve it
    vo = next((r for r in ranking if r.verified_only), None)
    if vo is not None:
        ranking.sort(key=lambda r: (not r.verified_only, r.ms))
        assert ranking[0].verified_only
        a._tune_cache[autotune._tune_key(b)] = ranking
        served = np.asarray(autotune.spmm_tuned(a, b))
        assert allclose(served, ref, 1e-2, 1e-3)
        safe_first = next(r for r in ranking if not r.verified_only)
        out_safe = np.asarray(engine.run_kernel(
            safe_first.number, a, b, tpuspmm.default_config()))
        np.testing.assert_array_equal(served, out_safe)


def test_ell_engine_reaches_staged_b():
    """K8 parity (VERDICT r2 #5): the ELL engine must expose a staged-B
    variant (reference registers spmmELLK2 at engine_ell.hpp:72-74) and
    an engine run of it must pass the gate."""
    eng = get_engine("ell")
    staged = [v for v in eng.variants if v.name == "pallas_staged_b"]
    assert staged, "ELL engine has no staged-B variant"
    v = staged[0]
    a = convert.to_format(CSR.random(120, 200, 0.05, seed=21), "ell")
    b = np.random.default_rng(4).standard_normal((200, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    cfg = tpuspmm.default_config()
    assert v.admissible(a, b, cfg), "staged-B inadmissible on a tiny ELL"
    out = np.asarray(v.fn(a, b, cfg))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_panel_family_rejects_ambiguous_split_mode():
    """'split' means the robust 3-term tier in tile/cres but the 2-term
    verified-only tier in the panel family — the panel entries must refuse
    it so config.precision_mode can never leak in with a different
    meaning (advisor finding r2)."""
    from tpuspmm.kernels import panel_spmm, pair_spmm

    a = CSR.random(64, 96, 0.2, seed=3)
    b = np.ones((96, 32), np.float32)
    for fn in (panel_spmm.spmm_panel, pair_spmm.spmm_pair):
        with pytest.raises(ValueError, match="split2"):
            fn(a, b, interpret=True, mode="split")
        out = np.asarray(fn(a, b, interpret=True, mode="split2"))
        assert out.shape == (64, 32)


def test_autotune_key_carries_config_fingerprint():
    """A ranking measured under one precision_mode/geometry must not be
    served under another (advisor finding r2): both the in-memory and
    disk keys must change when numerics-relevant Config fields change."""
    import dataclasses as dc

    from tpuspmm.engine import autotune
    from tpuspmm.config import Config

    a = CSR.random(64, 96, 0.2, seed=3)
    b = np.zeros((96, 32), np.float32)
    c1 = Config()
    c2 = dc.replace(c1, precision_mode="split2")
    c3 = dc.replace(c1, tile_k=256)
    assert autotune._tune_key(b, c1) != autotune._tune_key(b, c2)
    assert autotune._disk_key(a, b, c1) != autotune._disk_key(a, b, c2)
    assert autotune._disk_key(a, b, c1) != autotune._disk_key(a, b, c3)
    # non-numeric fields don't churn the cache
    c4 = dc.replace(c1, interpret=True)
    assert autotune._disk_key(a, b, c1) == autotune._disk_key(a, b, c4)


def test_autotune_key_carries_serving_dtype(small):
    """A bf16-ingested ranking (--b-dtype bf16) must not be served for
    f32 operands or vice versa — the winners and the gate both differ —
    and tune() must measure on the ingested dtype, not silently upcast."""
    import ml_dtypes

    from tpuspmm.engine import autotune

    a, b, _ = small
    b16 = b.astype(ml_dtypes.bfloat16)
    assert autotune._disk_key(a, b, None) != autotune._disk_key(a, b16, None)
    assert autotune._tune_key(b, None) != autotune._tune_key(b16, None)
    ranking = autotune.tune(a, b16, iters=1, use_disk_cache=False)
    assert ranking and not all(r.verified_only for r in ranking)


def test_autotune_budget_and_resume(tmp_path, monkeypatch):
    """VERDICT r2 #6: a budgeted-out (or killed) tune run persists partial
    results atomically and resumes without re-measuring finished
    variants."""
    import json

    from tpuspmm.engine import autotune

    monkeypatch.setenv("TPUSPMM_TUNE_CACHE", str(tmp_path / "tune.json"))
    a = CSR.random(100, 140, 0.08, seed=11)
    b = np.random.default_rng(2).standard_normal((140, 32)).astype(np.float32)

    # budget 0 after the first variant: the pass stops early, partial entry
    ranking1 = autotune.tune(a, b, iters=1, budget_s=0.0)
    data = json.load(open(tmp_path / "tune.json"))
    (key, entry), = data.items()
    assert not entry["complete"]
    n_done_1 = len(entry["done"])
    assert n_done_1 < get_engine("csr").num_kernels

    # resume: finishes the rest without redoing the done set
    measured = []
    from tpuspmm.utils import timing

    orig = timing.device_time_ms
    depth = [0]  # device_time_ms self-recurses below the RTT noise floor;
    # only OUTER calls correspond to variant measurements

    def spy(fn, b_, iters=1, **kw):
        if depth[0] == 0:
            measured.append(1)
        depth[0] += 1
        try:
            return orig(fn, b_, iters=iters, **kw)
        finally:
            depth[0] -= 1

    monkeypatch.setattr(timing, "device_time_ms", spy)
    a2 = CSR(a.indptr, a.indices, a.values, a.shape)  # fresh container,
    # same digest — forces the disk-cache path, not the in-memory one
    ranking2 = autotune.tune(a2, b, iters=1)
    entry2 = json.load(open(tmp_path / "tune.json"))[key]
    assert entry2["complete"]
    assert set(entry["done"]) <= set(entry2["done"])
    # + 2: the resume re-anchors the stored ranking by re-measuring the
    # anchor variant once, and the vendor baseline competes as an extra
    # candidate beyond num_kernels.  The panel and pair family sweeps
    # measure up to GEOM_CANDIDATES_K geometries each (one sweep per
    # family), adding up to K-1 extra measurements per family.
    budget = (get_engine("csr").num_kernels - n_done_1 + 2
              + 2 * (autotune.GEOM_CANDIDATES_K - 1))
    assert len(measured) <= budget
    # a third call serves the completed entry with zero measurements
    measured.clear()
    a3 = CSR(a.indptr, a.indices, a.values, a.shape)
    ranking3 = autotune.tune(a3, b, iters=1)
    assert not measured
    assert [r.variant_name for r in ranking3] == [r.variant_name for r in ranking2]


def test_auto_spmm_wide_b_does_not_crash():
    """Regression: select_format assumed width 256; a wide B made the
    C-resident recommendation inadmissible and raised instead of falling
    back."""
    a = CSR.random(512, 512, 0.05, seed=9)
    b = np.random.default_rng(4).standard_normal((512, 4096)).astype(np.float32)
    out, fmt, kernel = select.auto_spmm(a, b)
    assert allclose(np.asarray(out), oracle.spmm_oracle(a, b), 1e-2, 1e-3)


def test_csc_vendor_and_tuned_paths():
    """Regression: CSC crashed through method='vendor' (TypeError) and
    method='tuned' (KeyError 'csc')."""
    from tpuspmm.formats import CSC

    a_csr = CSR.random(80, 120, 0.1, seed=11)
    a = CSC.from_scipy(a_csr.to_scipy())
    b = np.random.default_rng(5).standard_normal((120, 16)).astype(np.float32)
    ref = oracle.spmm_oracle(a_csr, b)
    assert allclose(np.asarray(tpuspmm.spmm(a, b, method="vendor")), ref, 1e-2, 1e-3)
    assert allclose(np.asarray(tpuspmm.spmm(a, b, method="tuned")), ref, 1e-2, 1e-3)


def test_select_format_width_sensitive():
    """The C-resident recommendation must respect the actual B width."""
    a = CSR.random(1000, 8000, 0.01, seed=12)  # occupancy-heavy, M fits VMEM
    fmt_narrow, k_narrow = select.select_format(a, n_width=256)
    fmt_wide, k_wide = select.select_format(a, n_width=16384)
    if k_narrow == "pallas_c_resident":
        assert k_wide != "pallas_c_resident"  # 1024x16384 output >> VMEM


def test_autotune_partial_ranking_not_served_from_memory(tmp_path, monkeypatch):
    """A budget-exhausted tune must NOT attach its partial ranking to the
    in-memory serve cache — spmm_tuned would otherwise crown the partial
    subset's winner forever without measuring the rest (review r3).  The
    partial entry persists to disk and the next tune resumes it."""
    from tpuspmm.engine import autotune

    monkeypatch.setenv("TPUSPMM_TUNE_CACHE", str(tmp_path / "tune.json"))
    a = CSR.random(100, 140, 0.08, seed=13)
    b = np.random.default_rng(4).standard_normal((140, 32)).astype(np.float32)

    ranking = autotune.tune(a, b, iters=1, budget_s=0.0)
    assert ranking  # at least one variant measured this call
    cache = getattr(a, "_tune_cache", None) or {}
    assert autotune._tune_key(b) not in cache  # partial → not attached

    # a full tune completes (resuming the disk entry) and DOES attach
    full = autotune.tune(a, b, iters=1)
    cache = getattr(a, "_tune_cache", None) or {}
    assert autotune._tune_key(b) in cache
    assert len(full) >= len(ranking)


def test_autotune_vendor_competes_and_serves(small):
    """The vendor baseline (kernel -1, reference convention) competes in
    the tuned ranking, and spmm_tuned can serve it when it wins."""
    from tpuspmm.engine import autotune

    a, b, ref = small
    ranking = autotune.tune(a, b, iters=1, use_disk_cache=False)
    names = {r.variant_name for r in ranking}
    assert "vendor_sparse" in names
    # force the vendor to rank first: serving must route through
    # run_kernel(-1) and still pass the gate
    ranking.sort(key=lambda r: (r.number != -1, r.ms))
    assert ranking[0].number == -1
    a._tune_cache[autotune._tune_key(b)] = ranking
    served = np.asarray(autotune.spmm_tuned(a, b))
    assert allclose(served, ref, 1e-2, 1e-3)


def test_report_noise_floor_suppresses_derived_fields():
    """Derived GFLOP/s / roofline fields require a measurement above the
    chained timer's ~2 µs noise floor — on the tunneled backend RTT
    subtraction can net a tiny kernel out to ~0 and the division would
    print absurd throughput (seen on small_32x32 on-chip verify records)."""
    from tpuspmm.engine.report import make_record

    kw = dict(testcase="t", sparsity=0.1, fmt="csr", kernel_type=1,
              nnz=98, shape=(32, 32), n=32)
    noisy = make_record(kernel_ms=1.9e-9, **kw)
    assert "gflops" not in noisy and "hbmRooflineFraction" not in noisy
    real = make_record(kernel_ms=0.5, **kw)
    assert real["gflops"] > 0 and real["nnzPerSec"] > 0


def test_timing_chain_lengthening_rule():
    """The chain must dominate the tunnel RTT before the RTT subtraction
    is trusted: a 1 ms chain against a 60 ms RTT is network jitter, not a
    kernel measurement (the round-3 panel ablation measured a 2.3x spread
    on identical geometries at iters=16 because of exactly this)."""
    from tpuspmm.utils.timing import _next_iters

    # signal buried under the RTT: grow enough to make it >= one RTT
    nxt = _next_iters(device_ms=1.0, rtt_ms=60.0, iters=16)
    assert nxt is not None and nxt * 1.0 / 16 >= 60.0
    # signal already dominates: accept
    assert _next_iters(device_ms=80.0, rtt_ms=60.0, iters=16) is None
    # cap respected (ultra-cheap kernels can't grow forever)
    assert _next_iters(device_ms=0.01, rtt_ms=60.0, iters=4096) is None
    # growth is computed against the 0.5 ms floor, so one step may not
    # reach the cap — but repeated application converges to it
    assert _next_iters(device_ms=0.01, rtt_ms=60.0, iters=16) == 1920
    # negative net (total < RTT) still grows, bounded by the 0.5 ms floor
    assert _next_iters(device_ms=-3.0, rtt_ms=60.0, iters=16) == 16 * 120


def test_split2_hazard_large_20000_never_served_by_default():
    """VERDICT r3 #9: the round-3 pair ablation showed the split2 tier
    SYSTEMATICALLY gate-fails on large_20000 under the resolved (row-
    permuted) geometry — all 6 split2 records are correct:false
    (results/ablate_pair.jsonl).  Mechanism: the matrix's values span
    |v| up to ~1.04e5, so the dropped lo*lo term's ~2^-16*|a|*|b|
    absolute error swamps small outputs, and the resolver's row
    reordering clusters heavy rows into shared strips, changing the
    accumulation's cancellation structure.  This test pins the two
    defenses: (a) the split tiers gate-fail here (so tune() excludes
    them from any ranking it verifies), and (b) they are registered
    verified_only (so even a stale/unverified ranking can never serve
    them through the default tuned path)."""
    from tpuspmm.data import data_dir
    from tpuspmm.formats import convert
    from tpuspmm.kernels import panel_spmm

    d = data_dir("large_20000")
    assert d is not None, "committed corpus dir missing"
    a = convert.load_sparse(d, "csr")
    rng = np.random.default_rng(11)
    b = rng.uniform(-1, 1, (a.shape[1], 64)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)

    # the hazard is real: the resolved geometry is row-permuted and the
    # split2 tier misses the gate on it
    geom = panel_spmm.resolve_panel_geometry(
        a, 128, budget_bytes=8 * 1024 * 1024,
        plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
    assert geom is not None and geom.row_perm is not None
    out = np.asarray(panel_spmm.spmm_panel(a, b, mode="split2"))
    assert not allclose(out, ref, 1e-2, 1e-3), (
        "split2 now passes the gate on large_20000 — if the tier's "
        "numerics improved, update BENCHMARKS.md's boundary-case note")

    # the defense: every split tier is flagged verified_only, and the
    # default tuned serving path filters those out (spmm_tuned's
    # allow_verified_only=False), so the hazard can never be served
    eng = get_engine("csr")
    for v in eng.variants:
        if v.name.endswith("_split") or v.name.endswith("split2"):
            assert v.verified_only, v.name


def test_sweep_formats_retries_device_faults(tmp_path, monkeypatch):
    """VERDICT r3 #2 done-criterion: one RESOURCE_EXHAUSTED must not zero
    a sweep group — the harness probe-waits and re-runs the (dir, format)
    group, and --fresh regenerates the artifact in one generation."""
    import json

    from bench import sweep_formats

    calls = {"n": 0}

    def fake_run_engine(engine, a, b, **kw):
        calls["n"] += 1
        from tpuspmm.engine.report import make_record

        common = dict(testcase=kw.get("testcase", "t"), sparsity=0.1,
                      fmt="csr", nnz=10, shape=(4, 4), n=4)
        if calls["n"] == 1:  # first attempt: device fault
            rec = make_record(kernel_type=1, kernel_name="boom",
                              extra={"error": "RESOURCE_EXHAUSTED: oom"},
                              **common)
            rec["device_fault"] = "1"
            return [rec]
        return [make_record(kernel_type=1, kernel_name="ok", correct=True,
                            kernel_ms=0.5, **common)]

    waited = {"n": 0}
    import bench.await_tpu as await_mod

    monkeypatch.setattr(await_mod, "await_tpu",
                        lambda budget_s=600: waited.update(
                            n=waited["n"] + 1) or True)
    monkeypatch.setattr("tpuspmm.engine.runner.run_engine", fake_run_engine)
    monkeypatch.setattr(sweep_formats, "run_engine", fake_run_engine,
                        raising=False)

    out = tmp_path / "sweep.jsonl"
    out.write_text('{"stale": "generation"}\n')  # --fresh must drop this
    rc = sweep_formats.main([
        "--data-root", "data", "--dirs", "small_32x32", "--formats", "csr",
        "--out", str(out), "--fresh", "--retries", "2", "--skip-seq"])
    recs = [json.loads(l) for l in out.read_text().splitlines()
            if l.startswith("{")]
    assert rc == 0
    assert waited["n"] == 1, "await_tpu not called on fault"
    assert calls["n"] == 2, "group not retried exactly once"
    assert all("stale" not in r for r in recs), "--fresh kept old records"
    assert any(r.get("kernelName") == "ok" for r in recs)
    assert not any(r.get("kernelName") == "boom" for r in recs), (
        "only the final attempt's records should be emitted")


def test_sweep_formats_exhausted_fault_exits_rc2(tmp_path, monkeypatch):
    """A group still device-faulted after the in-process retries must exit
    rc 2 — an --isolate parent spawns children with --retries 0 and uses
    the child's rc as its ONLY retry signal.  Round-4's small_210 csr/coo
    groups shipped 2-record stubs because a faulted child exited 0."""
    from bench import sweep_formats

    def fake_run_engine(engine, a, b, **kw):
        from tpuspmm.engine.report import make_record

        rec = make_record(testcase=kw.get("testcase", "t"), sparsity=0.1,
                          fmt="csr", nnz=10, shape=(4, 4), n=4,
                          kernel_type=1, kernel_name="boom",
                          extra={"error": "UNAVAILABLE: TPU device error"})
        rec["device_fault"] = "1"
        return [rec]

    import bench.await_tpu as await_mod

    monkeypatch.setattr(await_mod, "await_tpu", lambda budget_s=600: True)
    monkeypatch.setattr("tpuspmm.engine.runner.run_engine", fake_run_engine)
    monkeypatch.setattr(sweep_formats, "run_engine", fake_run_engine,
                        raising=False)

    out = tmp_path / "sweep.jsonl"
    rc = sweep_formats.main([
        "--data-root", "data", "--dirs", "small_32x32", "--formats", "csr",
        "--out", str(out), "--fresh", "--retries", "1", "--skip-seq"])
    assert rc == 2, "exhausted device fault must be visible in the rc"


def test_gather_family_admission_caps_materialized_intermediate():
    """The XLA gather+segment-sum lowering materializes an (nnz, n)
    intermediate; at large_20000's reference width (n=20000) that is
    ~11 GB and the OOM poisons the JAX client (rounds 3-4).  The variant
    must skip (inadmissible) instead of attempting it."""
    from tpuspmm.engine import registry

    cfg = tpuspmm.default_config()
    a = CSR.random(100, 140, 0.08, seed=11)
    b_small = np.zeros((140, 64), np.float32)
    assert registry._gather_ok(a, b_small, cfg)
    # fake a huge width: nnz * n * 4 over the cap
    class WideB:
        shape = (140, registry.GATHER_MAX_BYTES // (4 * a.nnz) + 256)
    wide = np.zeros((1, 1), np.float32)  # placeholder; use shape shim
    assert not registry._gather_ok(
        a, np.broadcast_to(wide, (140, WideB.shape[1])), cfg)


def test_measure_family_restores_pick_when_all_candidates_fail(monkeypatch):
    """Review r4: a gate-FAILING candidate must not remain pinned (it
    would become THE resolved geometry for later gate-exact serving),
    and transient candidate pins must never reach the geometry disk
    cache."""
    import json
    import os

    from tpuspmm.config import default_config
    from tpuspmm.engine import autotune
    from tpuspmm.engine.registry import KernelVariant
    from tpuspmm.kernels import panel_spmm

    a = CSR.random(128, 256, 0.1, seed=5)
    b = np.random.default_rng(0).standard_normal((256, 32)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    cfg = default_config()

    def wrong(a_, b_, config):
        import jax.numpy as jnp

        # resolve (so the pinned candidate is consumed) but return junk
        panel_spmm.resolve_panel_geometry(
            a_, 128, panel_strips=config.panel_strips,
            budget_bytes=config.vmem_budget_bytes,
            plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
        return jnp.zeros((a_.shape[0], b_.shape[1]), jnp.float32)

    variant = KernelVariant(7, "pallas_panel", wrong)
    ms, rec = autotune._measure_family("panel", variant, a, b, cfg, ref,
                                       iters=1, verbose=False)
    assert ms is None and rec is None
    # the resolver now returns the PLAIN search's pick, same as if the
    # sweep never ran
    g = panel_spmm.resolve_panel_geometry(
        a, 128, panel_strips=cfg.panel_strips,
        budget_bytes=cfg.vmem_budget_bytes,
        plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
    a2 = CSR(a.indptr, a.indices, a.values, a.shape)  # no container cache
    g2 = panel_spmm.resolve_panel_geometry(
        a2, 128, panel_strips=cfg.panel_strips,
        budget_bytes=cfg.vmem_budget_bytes,
        plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
    assert (g.tm, g.panel_strips, g.tk, g.order_kind) == (
        g2.tm, g2.panel_strips, g2.tk, g2.order_kind)


def test_tune_resume_survives_inadmissible_first_variant(tmp_path,
                                                         monkeypatch):
    """Review r4: the resume re-anchor must not require variant #1 in
    the stored ranking — admission may legitimately skip it (gather cap
    at huge widths), and a wiped resume would re-measure forever on
    exactly the OOM-prone matrices the hardening exists for."""
    import dataclasses as dc
    import json

    from tpuspmm.engine import autotune
    from tpuspmm.engine.registry import get_engine

    monkeypatch.setenv("TPUSPMM_TUNE_CACHE", str(tmp_path / "t.json"))
    a = CSR.random(90, 120, 0.1, seed=7)
    b = np.random.default_rng(1).standard_normal((120, 32)).astype(np.float32)
    # full tune, then surgically remove variant #1 from the stored entry
    autotune.tune(a, b, iters=1)
    data = json.load(open(tmp_path / "t.json"))
    (key, entry), = data.items()
    entry["results"] = [r for r in entry["results"]
                        if r["variant_name"] != "xla_segment_sum"]
    entry["done"] = [d for d in entry["done"] if d != "xla_segment_sum"]
    entry["complete"] = False
    json.dump(data, open(tmp_path / "t.json", "w"))

    a2 = CSR(a.indptr, a.indices, a.values, a.shape)
    ranking = autotune.tune(a2, b, iters=1)
    names = {r.variant_name for r in ranking}
    # the stored (anchor-less-by-old-rules) entries survived the resume
    assert len(names) > 1
    assert "xla_segment_sum" in names  # and the removed one was re-measured


def test_run_engine_bf16_ingested_operand(small):
    """CLI --b-dtype bf16 (the pruned-LLM serving mode): run_engine serves
    the bf16 operand as-is — every variant and the vendor baseline are
    gated against the f64 oracle OF THE bf16 VALUES, and records carry
    bDtype=bf16 so sweep artifacts distinguish the serving dtype."""
    import ml_dtypes

    from tpuspmm.engine.registry import get_engine
    from tpuspmm.engine.runner import run_engine

    a, b, _ = small
    b16 = b.astype(ml_dtypes.bfloat16)
    records = run_engine(get_engine("csr"), b=b16, a=a, testcase="t",
                         repeats=1, emit=False)
    assert records and all(r.get("bDtype") == "bf16" for r in records)
    bad = [r for r in records if r.get("correct") == "0"
           and r.get("verifiedOnly") != "1"]
    assert not bad, bad
    # and an f32 operand is tagged explicitly (every record self-describes
    # its serving dtype — VERDICT r4 weak #5)
    recs32 = run_engine(get_engine("csr"), b=b, a=a, testcase="t",
                        repeats=1, emit=False)
    assert recs32 and all(r.get("bDtype") == "f32" for r in recs32)
    assert all(r.get("bCols") == b.shape[1] for r in recs32)


def test_sweep_formats_vendor_only_fault_not_retried(tmp_path, monkeypatch):
    """A fault carried ONLY by the vendor baseline (kernel -1, runs last
    — truncates nothing, and its remote-compile 500 on huge shapes is
    persistent) must not trigger group retries or a non-zero rc."""
    from bench import sweep_formats

    calls = {"n": 0}

    def fake_run_engine(engine, a, b, **kw):
        calls["n"] += 1
        from tpuspmm.engine.report import make_record

        common = dict(testcase=kw.get("testcase", "t"), sparsity=0.1,
                      fmt="csr", nnz=10, shape=(4, 4), n=4)
        ok = make_record(kernel_type=1, kernel_name="ok", correct=True,
                         kernel_ms=0.5, **common)
        vend = make_record(kernel_type=-1, kernel_name="vendor_sparse",
                           extra={"error": "INTERNAL: HTTP 500"}, **common)
        return [ok, vend]

    monkeypatch.setattr("tpuspmm.engine.runner.run_engine", fake_run_engine)
    monkeypatch.setattr(sweep_formats, "run_engine", fake_run_engine,
                        raising=False)
    out = tmp_path / "sweep.jsonl"
    rc = sweep_formats.main([
        "--data-root", "data", "--dirs", "small_32x32", "--formats", "csr",
        "--out", str(out), "--fresh", "--retries", "2", "--skip-seq"])
    assert rc == 0, "vendor-only fault must not fail the sweep"
    assert calls["n"] == 1, "vendor-only fault must not be retried"


def test_densify_variant_all_formats(small):
    """The cached-densify variant (round 5: densify once at plan time,
    serve one dense MXU matmul per call) exists in every engine and is
    gate-exact; duplicates accumulate through the cache build."""
    import jax.numpy as jnp

    from tpuspmm.config import default_config
    from tpuspmm.engine.registry import get_engine
    from tpuspmm.formats import COO, convert
    from tpuspmm.ops import oracle
    from tpuspmm.utils.compare import allclose

    a, b, ref = small
    cfg = default_config()
    for fmt, num in (("csr", 4), ("coo", 7), ("bsr", 7), ("ell", 8)):
        eng = get_engine(fmt)
        v = eng.variant(num)
        assert v.name == "xla_densify_matmul", (fmt, v.name)
        af = convert.to_format(a, fmt)
        out = np.asarray(v.fn(af, b, cfg))
        assert allclose(out, ref, 1e-2, 1e-3), fmt
        # the dense operand is cached on the COO view after first serve
        from tpuspmm.ops.xla import coo_view

        assert "dense_f32" in getattr(coo_view(af), "_xla_cache", {})
    # duplicate coordinates accumulate (COO semantics)
    c = COO(shape=(4, 4), rows=np.array([0, 0], np.int32),
            cols=np.array([1, 1], np.int32),
            values=np.array([1.5, 2.5], np.float32))
    out = np.asarray(get_engine("coo").variant(7).fn(
        c, np.eye(4, dtype=np.float32), cfg))
    assert out[0, 1] == 4.0


def test_spmm_method_densify(small):
    """Public spmm(method='densify') routes through the cached dense
    operand for every container kind, including formats outside the
    engine registry (CSC serves via its COO view)."""
    from tpuspmm.formats import convert
    from tpuspmm.ops.xla import coo_view

    a, b, ref = small
    for fmt in ("csr", "coo", "bsr", "ell", "csc"):
        af = convert.to_format(a, fmt)
        out = np.asarray(tpuspmm.spmm(af, b, method="densify"))
        assert allclose(out, ref, 1e-2, 1e-3), fmt
        assert "dense_f32" in getattr(coo_view(af), "_xla_cache", {}), fmt


def test_vendor_width_tiled_fallback(small, monkeypatch):
    """When the whole-width vendor program fails to compile (the
    persistent remote-compile INTERNAL on large_20000's 20000-wide
    operand), spmm_vendor discovers a width-tiled BCOO serve, pins the
    tile on the container, and traced serves route through it."""
    import warnings as _warnings

    import jax.numpy as jnp

    from tpuspmm.ops import vendor

    a, _, _ = small
    b = np.random.default_rng(3).standard_normal(
        (a.shape[1], 512)).astype(np.float32)  # wide enough to tile
    ref = oracle.spmm_oracle(a, b)
    c = convert.to_format(a, "coo")
    calls = {"n": 0}

    def failing(a_bcoo, bb):
        calls["n"] += 1
        raise RuntimeError("INTERNAL: http://remote_compile 500")

    monkeypatch.setattr(vendor, "_bcoo_spmm", failing)
    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        out = np.asarray(vendor.spmm_vendor(c, b))
    assert allclose(out, ref, 1e-2, 1e-3)
    assert vendor.last_lowering(c).startswith("bcoo_tiled")
    assert c._vendor_cache["tile_n"] < b.shape[1]
    # subsequent serves route straight to the tiled path (no rediscovery)
    n_before = calls["n"]
    out2 = np.asarray(vendor.spmm_vendor(c, b))
    assert calls["n"] == n_before and allclose(out2, ref, 1e-2, 1e-3)
    # a B narrower than the pinned tile serves whole-width (monkeypatch
    # still active, so the failing stub proves the routing): the pinned
    # tile must not pad a narrow operand up to the wide discovery
    b_narrow = b[:, :32]
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="INTERNAL"):
        vendor.spmm_vendor(c, b_narrow)


def test_runner_wall_fallback_when_chained_timer_fails(small, monkeypatch):
    """A chained-timer failure (e.g. the timing program RESOURCE_EXHAUSTs
    where the serve fits — large_20000 vendor, round 5) must degrade the
    record to wall timing, not error it."""
    import tpuspmm.engine.runner as runner_mod
    from tpuspmm.engine.registry import Engine, KernelVariant
    from tpuspmm.engine.runner import run_engine
    from tpuspmm.ops import oracle as oracle_mod

    a, b, _ = small

    def good(a_, b_, cfg):
        import jax.numpy as jnp

        return jnp.asarray(oracle_mod.spmm_scipy_oracle(a_, np.asarray(b_))
                           .astype(np.float32))

    eng = Engine(fmt="csr", variants=[KernelVariant(1, "good", good)])
    # force the TPU timing branch, then make the chained timer blow up
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")

    def boom_timer(*a_, **k_):
        raise RuntimeError("RESOURCE_EXHAUSTED: timing chain")

    monkeypatch.setattr("tpuspmm.utils.timing.device_time_ms", boom_timer)
    records = run_engine(eng, a, b, testcase="t", repeats=1, emit=False,
                         run_vendor=False)
    rec = next(r for r in records if r["kernelName"] == "good")
    assert rec["correct"] == "1"
    assert rec["tpuKernelTimeMs"] > 0
    assert rec["timingMode"].startswith("wall")


def test_vendor_proactive_tiled_routing(monkeypatch):
    """Oversized operands (B+C > 2 GiB) must route to the width-tiled
    serve WITHOUT attempting the whole-width program (which OOMs the
    device and poisons the client at that scale); the tile divides N
    when a divisor exists so B needs no padded copy."""
    from tpuspmm.formats import COO
    from tpuspmm.ops import vendor

    # fake-huge shape via a tiny matrix whose shape metadata lies is not
    # possible (frozen containers), so monkeypatch the whole-width path
    # to assert it is never called for a synthetic big-shape container
    calls = {"whole": 0}
    real = vendor._bcoo_spmm

    def spy(a_bcoo, bb):
        calls["whole"] += 1
        return real(a_bcoo, bb)

    monkeypatch.setattr(vendor, "_bcoo_spmm", spy)
    # shrink the routing threshold so the test shapes stay CI-sized
    monkeypatch.setattr(vendor, "TILED_ROUTE_BYTES", 1 * 1024 * 1024)

    rng = np.random.default_rng(0)
    m, k, n = 64, 100, 2500  # (m+k)*n*4 = 1.6 MB > 1 MB, n > 2048
    rows = rng.integers(0, m, 200).astype(np.int32)
    cols = rng.integers(0, k, 200).astype(np.int32)
    a = COO(shape=(m, k), rows=rows, cols=cols,
            values=rng.standard_normal(200).astype(np.float32))
    b = rng.standard_normal((k, n)).astype(np.float32)
    out = np.asarray(vendor.spmm_vendor(a, b))
    assert calls["whole"] == 0  # whole-width never attempted
    assert vendor.last_lowering(a) == "bcoo_tiled1250"
    assert a._vendor_cache["tile_n"] == 1250  # largest divisor of 2500 <= 2048
    from tpuspmm.ops import oracle

    ref = oracle.spmm_oracle(a, b)
    from tpuspmm.utils.compare import allclose

    assert allclose(out, ref, 1e-2, 1e-3)
