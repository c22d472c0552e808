"""Autotuner: measure the admissible strategies once, serve the winner.

The dispatch heuristics (tpuspmm/kernels/dispatch.py) are fitted averages;
for a serving workload that will execute the same SpMM millions of times,
it is worth paying one measurement pass per (matrix, width) to pick the
true winner.  ``tune`` times every admissible engine variant with the
chained device timer, verifies each result against the scipy oracle
(rel 1e-2 / abs 1e-3, reference/include/utils.hpp:10-11 — only
gate-passing variants may win), and caches the ranking on the container
and in an on-disk JSON cache keyed by (matrix digest, width, chip) so
serving processes skip the measurement pass entirely.
``spmm(a, b, method="tuned")`` serves the cached winner (tuning on first
use).

The reference has no analogue — its kernel choice is the CLI user's job —
but cuSPARSE's ALG_DEFAULT autotuning plays this role in production CUDA
stacks.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import List, Optional, Set, Tuple

import numpy as np


@dataclasses.dataclass
class TuneResult:
    variant_name: str
    number: int
    ms: float
    # split-precision tiers whose gate pass is VALUE-dependent: they may
    # only be served for workloads the caller gate-checks per operand
    # (the tune-time gate pass proves nothing about future operands of
    # the same width)
    verified_only: bool = False
    # geometry provenance for panel/pair-family variants: the measured-
    # best candidate's (tm, P, tk, sm, order, plan_mb) / (CH, sm,
    # tile_n, order, plan_mb) — carried into bench records so a
    # regression in geometry resolution is visible round-over-round
    geom: Optional[dict] = None


def _config_fp(config=None) -> str:
    """Fingerprint of the Config fields that change a variant's numerics
    or geometry.  A ranking measured (and gate-verified) under one
    precision_mode / tile geometry must never be served under another —
    e.g. tune under precision_mode='split' then serve under 'split2'
    would run un-verified ~2^-17 numerics through a 'verified' winner
    (advisor finding, round 2)."""
    if config is None:
        from tpuspmm.config import default_config

        config = default_config()
    key = (config.precision_mode, config.tile_m, config.tile_k,
           config.chunk_nnz, config.tile_n_cap, config.vmem_budget_bytes,
           config.panel_strips)
    return hashlib.sha1(repr(key).encode()).hexdigest()[:8]


def _b_dtype_name(b) -> str:
    """Serving-dtype tag without materializing ``b``: np.asarray on a
    device array would fetch the whole operand through the tunnel just
    to read its dtype."""
    dt = getattr(b, "dtype", None)
    return dt.name if dt is not None else np.asarray(b).dtype.name


def _tune_key(b, config=None) -> tuple:
    # serving dtype is part of the key (bf16-ingested rankings differ)
    return ("tuned", int(np.shape(b)[1]), _config_fp(config),
            _b_dtype_name(b))


def _as_tunable(a):
    """Containers outside the engine registry (e.g. CSC) tune through a
    CSR view — cached on the original container so the tune cache persists
    across calls instead of re-measuring every time."""
    from tpuspmm.engine.registry import FORMATS

    if a.format_name in FORMATS:
        return a
    cached = getattr(a, "_tunable_csr", None)
    if cached is None:
        cached = a.to_csr()
        try:
            object.__setattr__(a, "_tunable_csr", cached)
        except Exception:
            pass
    return cached


# ---------------------------------------------------------------------------
# on-disk ranking cache (per matrix digest × width × chip)
# ---------------------------------------------------------------------------

def _disk_cache_path() -> str:
    return os.environ.get(
        "TPUSPMM_TUNE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "tpuspmm", "tune.json"))


def matrix_digest(a) -> str:
    """Stable fingerprint of a container's structure+values, cached on
    the container.  Hashes the FULL arrays (a prefix-only hash would let
    two matrices differing past the prefix collide in the disk cache and
    be served each other's verified rankings); sha1 over a contiguous
    memoryview runs at GB/s, and the result is computed once per
    container."""
    cached = getattr(a, "_matrix_digest", None)
    if cached is not None:
        return cached
    h = hashlib.sha1()
    h.update(repr((a.format_name, tuple(a.shape), int(a.nnz))).encode())
    for name in ("indptr", "indices", "rows", "cols", "values", "blocks",
                 "rowind"):
        arr = getattr(a, name, None)
        if arr is not None:
            h.update(np.ascontiguousarray(np.asarray(arr)).data)
    digest = h.hexdigest()[:16]
    try:
        object.__setattr__(a, "_matrix_digest", digest)
    except Exception:
        pass
    return digest


def _engine_rev(fmt: str) -> str:
    """Fingerprint of the format's variant set — cached rankings from an
    older engine (missing variants added since) must not be served."""
    from tpuspmm.engine.registry import get_engine

    eng = get_engine(fmt)
    names = ",".join(v.name for v in eng.variants)
    if eng.supports_vendor:
        names += ",vendor"  # vendor now competes in the ranking —
        # pre-vendor disk entries must re-tune
    return hashlib.sha1(names.encode()).hexdigest()[:8]


def _vendor_variant():
    """The vendor baseline as a tune candidate (kernel number -1,
    reference convention): production serving should use the library path
    whenever it genuinely beats every custom variant — the reference
    frames its whole benchmark as custom-vs-cuSPARSE
    (reference/src/engine/engine.cpp:47-55)."""
    from tpuspmm.engine.registry import KernelVariant

    def fn(a, b, config):
        from tpuspmm.ops import vendor

        return vendor.spmm_vendor(a, b)

    # NB the vendor lowering (gather + segment ops, not MXU matmuls)
    # passes the rel 1e-2/abs 1e-3 gate at default precision on the real
    # chip — all 48 vendor records in results/formats_full.jsonl are
    # correct:"1" — so tune()'s gate does not silently exclude it there.
    return KernelVariant(-1, "vendor_sparse", fn,
                         "jax.experimental.sparse BCOO/BCSR baseline")


def _disk_key(a, b, config=None) -> str:
    from tpuspmm.engine.report import detect_chip
    from tpuspmm.kernels.dispatch import thresholds

    # v3: entries carry the Config fingerprint (a ranking verified under
    # one precision/geometry must not be served under another) and a
    # done/complete resume ledger; v1/v2 entries never match a v3 key.
    # v4: panel/pair-family entries were measured over the model's top
    # geometry CANDIDATES and carry the pinned winner's provenance — a
    # v3 entry's ms is the model's single resolved pick (round 3 showed
    # it can be 2.2x off the measured-best), so it must not be served.
    # The chip-constants fingerprint keeps the ranking and the pinned
    # geometry in lockstep: a constants refit invalidates the GEOMETRY
    # disk cache (its key embeds thresholds), so a surviving tune entry
    # would claim a measured-winner geometry that serving no longer
    # resolves — both caches must turn over together.
    th_fp = hashlib.sha1(repr(sorted(thresholds().items())).encode()
                         ).hexdigest()[:8]
    # the serving dtype is part of the key: a bf16-ingested ranking
    # (--b-dtype bf16 — different pass ladders, different winners) must
    # never be served for f32 operands or vice versa.  f32 keys keep the
    # historical spelling so existing caches survive.
    bdt = _b_dtype_name(b)
    dt = "" if bdt == "float32" else f":d{bdt}"
    return (f"v4:{matrix_digest(a)}:{a.format_name}:n{int(np.shape(b)[1])}"
            f":{detect_chip()}:e{_engine_rev(a.format_name)}"
            f":c{_config_fp(config)}:t{th_fp}{dt}")


def _disk_load(key: str) -> Optional[Tuple[List[TuneResult], Set[str], bool]]:
    """Load a v3 cache entry → (results, variants-already-attempted,
    complete?).  Partial entries (killed/budgeted-out tune runs) resume
    instead of re-measuring."""
    path = _disk_cache_path()
    try:
        with open(path) as f:
            data = json.load(f)
        entry = data.get(key)
        if entry is None:
            return None
        results = [TuneResult(e["variant_name"], e["number"], e["ms"],
                              e.get("verified_only", False),
                              e.get("geom"))
                   for e in entry["results"]]
        return results, set(entry.get("done", [])), bool(entry.get("complete"))
    except Exception:
        return None


def _disk_store(key: str, results: List[TuneResult], done: Set[str],
                complete: bool) -> None:
    path = _disk_cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = {}
        if os.path.exists(path):
            try:
                with open(path) as f:
                    data = json.load(f)
            except Exception:
                data = {}  # corrupted cache file — heal it by rewriting
        data[key] = {"results": [dataclasses.asdict(r) for r in results],
                     "done": sorted(done), "complete": complete}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, path)  # atomic — a killed run never truncates it
    except Exception:
        pass  # the disk cache is best-effort


# ---------------------------------------------------------------------------
# geometry-candidate measurement for the panel/pair kernel families
# ---------------------------------------------------------------------------
# The geometry resolvers pick by a fitted cost model whose residual RMS
# (~0.12 ms, results/panel_model_fit.json) is comparable to the spread
# between its top picks — round 3's driver served a 0.141 ms geometry
# while the model's own #2 candidate measured 0.064 ms on the same chip.
# So tune() measures the model's top-K candidates per family variant and
# PINS the measured winner (container + disk geometry cache): serving
# must dispatch what was measured fastest, not what was modelled fastest.

_GEOM_FAMILIES = {
    "pallas_panel": "panel", "pallas_panel_split": "panel",
    "pallas_pair": "pair", "pallas_pair_split": "pair",
}
GEOM_CANDIDATES_K = 3


def _geom_candidates(family: str, a, b, config, k: int = GEOM_CANDIDATES_K):
    from tpuspmm.kernels.common import round_up

    n_pad = round_up(int(np.shape(b)[1]), 128)
    if family == "panel":
        from tpuspmm.kernels import panel_spmm

        return panel_spmm.resolve_panel_geometry_candidates(
            a, n_pad, k=k, panel_strips=config.panel_strips,
            budget_bytes=config.vmem_budget_bytes,
            plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
    from tpuspmm.kernels import pair_spmm

    return pair_spmm.resolve_pair_geometry_candidates(
        a, n_pad, k=k, budget_bytes=config.vmem_budget_bytes,
        plan_bytes_cap=pair_spmm.PLAN_BYTES_CAP)


def _pin_geom(family: str, a, geom, b, config, disk: bool = True) -> None:
    """Pin ``geom`` under exactly the resolver key the registry serving
    path uses (spmm_panel/spmm_pair with the Config budget and the
    module PLAN_BYTES_CAP).  ``disk=False`` pins the container cache
    only — candidate MEASUREMENT uses it so a process killed mid-sweep
    (or an all-candidates-fail path) can never leave a transient,
    never-validated candidate as the persisted geometry another serving
    process would resolve."""
    from tpuspmm.kernels.common import round_up

    n_pad = round_up(int(np.shape(b)[1]), 128)
    if family == "panel":
        from tpuspmm.kernels import panel_spmm

        panel_spmm.pin_panel_geometry(
            a, geom, n_pad=n_pad, panel_strips=config.panel_strips,
            budget_bytes=config.vmem_budget_bytes,
            plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP, disk=disk)
    else:
        from tpuspmm.kernels import pair_spmm

        pair_spmm.pin_pair_geometry(
            a, geom, n_pad=n_pad, budget_bytes=config.vmem_budget_bytes,
            plan_bytes_cap=pair_spmm.PLAN_BYTES_CAP, disk=disk)


def _geom_record(family: str, geom) -> dict:
    """Provenance dict for records (BENCH geometry field, VERDICT r3
    weak #7)."""
    if family == "panel":
        return {"family": "panel", "tm": int(geom.tm),
                "P": int(geom.panel_strips), "tk": int(geom.tk),
                "sm": int(geom.sm), "order": geom.order_kind,
                "plan_mb": round(geom.plan_bytes / 1e6, 2)}
    return {"family": "pair", "CH": int(geom.chunk_strips),
            "sm": int(geom.sm), "tile_n": int(geom.tile_n),
            "order": geom.order_kind,
            "plan_mb": round(geom.plan_bytes / 1e6, 2)}


def _measure_family(family, variant, a, b_dev, config, ref, iters,
                    verbose):
    """Pin + measure each of the model's top geometry candidates for a
    panel/pair-family variant; PIN the measured winner so serving
    dispatches it, and return (winner ms, geometry provenance dict).

    Returns (None, None) when every candidate deterministically fails
    the correctness gate (exclude the variant); re-raises the last
    exception when every candidate faulted (transient — a future resume
    must retry, mirroring tune()'s per-variant policy)."""
    from tpuspmm.utils.compare import allclose
    from tpuspmm.utils.timing import device_time_ms

    cands = _geom_candidates(family, a, b_dev, config)
    if not cands:
        # admission said yes but the enumerator found nothing (stale
        # pinned/disk geometry) — fall back to the plain resolved path
        out = variant.fn(a, b_dev, config)
        if ref is not None and not allclose(
                np.asarray(out), ref, config.rel_tol, config.abs_tol):
            return None, None
        return device_time_ms(lambda bb: variant.fn(a, bb, config),
                              b_dev, iters=iters), None
    best = None  # (ms, geom)
    gate_failed = 0
    last_exc = None
    try:
        for g in cands:
            try:
                # container-cache-only pin: a transient candidate must
                # never persist to the geometry disk cache (a process
                # kill mid-sweep would otherwise leave it as THE
                # resolved geometry for every future serving process)
                _pin_geom(family, a, g, b_dev, config, disk=False)
                out = variant.fn(a, b_dev, config)  # warm/compile
                if ref is not None and not allclose(
                        np.asarray(out), ref, config.rel_tol,
                        config.abs_tol):
                    gate_failed += 1
                    continue
                ms = device_time_ms(lambda bb: variant.fn(a, bb, config),
                                    b_dev, iters=iters)
            except Exception as e:
                last_exc = e
                continue
            if verbose:
                print(f"# tune: {variant.name} candidate "
                      f"{_geom_record(family, g)}: {ms:.3f} ms")
            if best is None or ms < best[0]:
                best = (ms, g)
    finally:
        if best is None:
            # restore the plain resolver's pick (candidate #0 leads with
            # it): a gate-FAILING or faulted candidate must not remain
            # pinned for later serving of the gate-exact siblings
            _pin_geom(family, a, cands[0], b_dev, config, disk=False)
    if best is None:
        if gate_failed:
            return None, None  # deterministic numerics failure — exclude
        if last_exc is not None:
            raise last_exc  # every candidate faulted — retry on resume
        return None, None
    # the winner must be what serving resolves, in THIS process (container
    # cache) and every later one (geometry disk cache) — measurement may
    # have left a slower candidate pinned
    _pin_geom(family, a, best[1], b_dev, config)
    return best[0], _geom_record(family, best[1])


def tune(a, b, iters: int = 8, config=None, verbose: bool = False,
         verify: bool = True, use_disk_cache: bool = True,
         budget_s: Optional[float] = None,
         resume: bool = True) -> List[TuneResult]:
    """Measure every admissible variant of `a`'s format engine; cache and
    return the ranking (fastest first).  With ``verify`` (default), a
    variant only enters the ranking if its result passes the correctness
    gate against the scipy oracle — the tuned path must never serve a
    fast-but-wrong kernel.

    Unattended-run hardening: every verified per-variant measurement is
    persisted to the disk cache IMMEDIATELY (atomic replace), so a tune
    run killed mid-pass — e.g. a wedged TPU tunnel — resumes from the
    last finished variant instead of re-measuring (``resume``, default
    on).  ``budget_s`` bounds the pass: once exceeded, remaining variants
    are left for a future resume and the entry is stored as partial.
    (The budget is checked between variants — an in-flight compile cannot
    be safely interrupted on this backend; see CLAUDE.md on the tunnel
    wedge.)"""
    import jax.numpy as jnp

    from tpuspmm.config import default_config
    from tpuspmm.engine.registry import get_engine
    from tpuspmm.utils.compare import allclose
    from tpuspmm.utils.timing import device_time_ms

    config = config or default_config()
    a = _as_tunable(a)
    engine = get_engine(a.format_name)
    # preserve a bf16-ingested operand (mirrors run_engine): the ranking
    # must be measured on the dtype it will serve — bf16 changes both
    # the winners (single exact MXU pass vs split ladders) and the gate
    # (checked vs the f64 oracle OF the bf16 values)
    if _b_dtype_name(b) == "bfloat16":
        b_dev = jnp.asarray(b)
    else:
        b_dev = jnp.asarray(b, jnp.float32)

    dkey = _disk_key(a, b, config) if use_disk_cache else None
    results: List[TuneResult] = []
    done: Set[str] = set()
    if dkey is not None:
        cached = _disk_load(dkey)
        if cached is not None:
            results, done, complete = cached
            if complete and results:
                _attach(a, b, results, config)
                return results
            if not resume:
                results, done = [], set()
            elif verbose and done:
                print(f"# tune: resuming — {len(done)} variants already "
                      f"attempted, {len(results)} ranked")
    if results:
        # Re-anchor a resumed ranking: chip speed drifts across sessions
        # (MEMORY.md axon-tunnel-wedge), so ms measured last session is
        # not comparable with this session's.  The anchor is the first
        # STORED entry (it was measurable last session, so it is
        # measurable now) — variant #1 cannot serve as a fixed anchor
        # because admission may skip it (e.g. _gather_ok at huge widths,
        # exactly the matrices resume hardening exists for).
        by_name = {v.name: v for v in engine.variants}
        anchor_res = next((r for r in results
                           if r.variant_name in by_name
                           and not r.verified_only), None)
        if anchor_res is None:
            # nothing re-measurable in the stored ranking — its ms are
            # uncomparable; re-measure from scratch (correctness over
            # resume speed)
            results, done = [], set()
        else:
            try:
                from tpuspmm.utils.timing import device_time_ms as _dtm

                anchor = by_name[anchor_res.variant_name]
                now_ms = _dtm(lambda bb: anchor.fn(a, bb, config), b_dev,
                              iters=iters)
                scale = now_ms / anchor_res.ms if anchor_res.ms > 0 else 1.0
                if abs(scale - 1.0) > 0.05:
                    results = [dataclasses.replace(
                        r, ms=round(r.ms * scale, 4)) for r in results]
                    if verbose:
                        print(f"# tune: re-anchored resumed ranking on "
                              f"{anchor.name} (session speed ratio "
                              f"{scale:.3f})")
            except Exception:
                pass  # backend down — this session's measurements will
                # fail too, so nothing incomparable gets merged

    ref = None
    if verify:
        from tpuspmm.ops import oracle

        ref = oracle.spmm_scipy_oracle(a, np.asarray(b_dev))
    t_start = time.monotonic()
    out_of_budget = False
    attempted = 0  # measurement attempts THIS call — at least one per call,
    # so a tight budget still makes forward progress across resumes
    persist = dkey is not None and verify  # only VERIFIED rankings persist —
    # a verify=False run would otherwise poison later verify=True tunes

    candidates = list(engine.variants)
    if engine.supports_vendor:
        candidates.append(_vendor_variant())
    # one geometry-candidate sweep per panel/pair family per tune pass:
    # the first family variant measured sweeps + pins; its sibling (the
    # split tier shares the plan and geometry ordering) serves the pinned
    # winner.  Seed from resumed results so a resume doesn't re-sweep.
    family_geom = {}
    for r in results:
        fam = _GEOM_FAMILIES.get(r.variant_name)
        if fam is not None and r.geom is not None:
            family_geom.setdefault(fam, r.geom)
    for variant in candidates:
        if variant.name in done:
            continue
        if (budget_s is not None and attempted > 0
                and time.monotonic() - t_start > budget_s):
            out_of_budget = True
            if verbose:
                print(f"# tune: budget {budget_s:.0f}s exhausted; "
                      f"remaining variants left for resume")
            break
        if variant.admissible is not None and not variant.admissible(a, b_dev, config):
            done.add(variant.name)  # deterministic — safe to persist
            continue
        attempted += 1
        family = _GEOM_FAMILIES.get(variant.name)
        geom_rec = None
        try:
            if family is not None and family not in family_geom:
                ms, geom_rec = _measure_family(family, variant, a, b_dev,
                                               config, ref, iters, verbose)
                if geom_rec is not None:
                    family_geom[family] = geom_rec
            else:
                geom_rec = family_geom.get(family) if family else None
                out = variant.fn(a, b_dev, config)  # warm caches/compile
                if ref is not None and not allclose(
                        np.asarray(out), ref, config.rel_tol, config.abs_tol):
                    ms = None  # gate miss — shared exclusion below
                else:
                    ms = device_time_ms(
                        lambda bb, v=variant: v.fn(a, bb, config),
                        b_dev, iters=iters)
            if ms is None:  # deterministic numerics failure — persist
                if verbose:
                    print(f"# tune: {variant.name} failed the gate; "
                          "excluded")
                done.add(variant.name)
                if persist:
                    _disk_store(dkey, results, done, complete=False)
                continue
        except Exception as e:
            if verbose:
                print(f"# tune: {variant.name} failed: {type(e).__name__}: {e}")
            # NOT added to the persisted ledger: an exception may be a
            # transient backend fault (the wedge this hardening exists
            # for) — a future resume must retry it, not skip it forever
            continue
        done.add(variant.name)
        results.append(TuneResult(variant.name, variant.number, round(ms, 4),
                                  bool(variant.verified_only), geom_rec))
        if persist:
            _disk_store(dkey, results, done, complete=False)
        if verbose:
            print(f"# tune: {variant.name}: {ms:.3f} ms")
    results.sort(key=lambda r: r.ms)

    # Only a COMPLETE ranking goes to the in-memory serve cache: attaching
    # a budget-exhausted subset would make spmm_tuned serve its winner
    # forever without ever measuring the remaining variants.  A partial
    # run persists to disk and the next tune()/spmm_tuned call resumes it.
    if not out_of_budget:
        _attach(a, b, results, config)
    if persist and results:
        _disk_store(dkey, results, done, complete=not out_of_budget)
    return results


def _attach(a, b, results: List[TuneResult], config=None) -> None:
    cache = getattr(a, "_tune_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(a, "_tune_cache", cache)
        except Exception:
            return
    if results:
        cache[_tune_key(b, config)] = results


def spmm_tuned(a, b, config=None, allow_verified_only: bool = False):
    """SpMM through the tuned winner for this (matrix, width); tunes on
    first use, falls back to the dispatch heuristic if tuning failed.

    By default verified_only tiers (value-dependent gate: split2 /
    panel_split) are skipped even when they rank first — the tune-time
    gate pass was for the TUNE operand, and this entry serves arbitrary
    future operands without re-checking.  Callers that gate-check each
    result themselves (engine runs, benches) pass
    ``allow_verified_only=True`` to serve the absolute winner."""
    from tpuspmm.config import default_config
    from tpuspmm.engine.registry import get_engine
    from tpuspmm.kernels import dispatch

    config = config or default_config()
    a = _as_tunable(a)
    cache = getattr(a, "_tune_cache", None) or {}
    ranking = cache.get(_tune_key(b, config))
    if ranking is None:
        ranking = tune(a, b, config=config)
    if not allow_verified_only:
        ranking = [r for r in ranking if not r.verified_only]
    if not ranking:
        return dispatch.spmm_pallas(a, b)
    engine = get_engine(a.format_name)
    # run_kernel handles the full numbering incl. -1 = vendor (the vendor
    # baseline competes in the ranking and may win)
    return engine.run_kernel(ranking[0].number, a, b, config)
