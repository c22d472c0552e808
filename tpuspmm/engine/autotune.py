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
from typing import List, Optional

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


def _tune_key(b) -> tuple:
    return ("tuned", int(np.shape(b)[1]))


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

    names = ",".join(v.name for v in get_engine(fmt).variants)
    return hashlib.sha1(names.encode()).hexdigest()[:8]


def _disk_key(a, b) -> str:
    from tpuspmm.engine.report import detect_chip

    # v2: entries carry verified_only; v1 entries (which don't) must not
    # be served as if their winners were unconditionally safe
    return (f"v2:{matrix_digest(a)}:{a.format_name}:n{int(np.shape(b)[1])}"
            f":{detect_chip()}:e{_engine_rev(a.format_name)}")


def _disk_load(key: str) -> Optional[List[TuneResult]]:
    path = _disk_cache_path()
    try:
        with open(path) as f:
            data = json.load(f)
        entry = data.get(key)
        if entry is None:
            return None
        return [TuneResult(e["variant_name"], e["number"], e["ms"],
                           e.get("verified_only", False))
                for e in entry]
    except Exception:
        return None


def _disk_store(key: str, results: List[TuneResult]) -> None:
    path = _disk_cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data[key] = [dataclasses.asdict(r) for r in results]
        with open(path, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
    except Exception:
        pass  # the disk cache is best-effort


def tune(a, b, iters: int = 8, config=None, verbose: bool = False,
         verify: bool = True, use_disk_cache: bool = True) -> List[TuneResult]:
    """Measure every admissible variant of `a`'s format engine; cache and
    return the ranking (fastest first).  With ``verify`` (default), a
    variant only enters the ranking if its result passes the correctness
    gate against the scipy oracle — the tuned path must never serve a
    fast-but-wrong kernel."""
    import jax.numpy as jnp

    from tpuspmm.config import default_config
    from tpuspmm.engine.registry import get_engine
    from tpuspmm.utils.compare import allclose
    from tpuspmm.utils.timing import device_time_ms

    config = config or default_config()
    a = _as_tunable(a)

    dkey = _disk_key(a, b) if use_disk_cache else None
    if dkey is not None:
        cached = _disk_load(dkey)
        if cached:
            _attach(a, b, cached)
            return cached

    engine = get_engine(a.format_name)
    b_dev = jnp.asarray(b, dtype=jnp.float32)
    ref = None
    if verify:
        from tpuspmm.ops import oracle

        ref = oracle.spmm_scipy_oracle(a, np.asarray(b_dev))
    results: List[TuneResult] = []
    for variant in engine.variants:
        if variant.admissible is not None and not variant.admissible(a, b_dev, config):
            continue
        try:
            out = variant.fn(a, b_dev, config)  # warm caches/compile
            if ref is not None and not allclose(
                    np.asarray(out), ref, config.rel_tol, config.abs_tol):
                if verbose:
                    print(f"# tune: {variant.name} failed the gate; excluded")
                continue
            ms = device_time_ms(lambda bb, v=variant: v.fn(a, bb, config),
                                b_dev, iters=iters)
        except Exception as e:
            if verbose:
                print(f"# tune: {variant.name} failed: {type(e).__name__}: {e}")
            continue
        results.append(TuneResult(variant.name, variant.number, round(ms, 4),
                                  bool(variant.verified_only)))
        if verbose:
            print(f"# tune: {variant.name}: {ms:.3f} ms")
    results.sort(key=lambda r: r.ms)

    _attach(a, b, results)
    # only VERIFIED rankings may persist — a verify=False run would
    # otherwise poison later verify=True tunes through the shared key
    if dkey is not None and results and verify:
        _disk_store(dkey, results)
    return results


def _attach(a, b, results: List[TuneResult]) -> None:
    cache = getattr(a, "_tune_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(a, "_tune_cache", cache)
        except Exception:
            return
    if results:
        cache[_tune_key(b)] = results


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
    ranking = cache.get(_tune_key(b))
    if ranking is None:
        ranking = tune(a, b, config=config)
    if not allow_verified_only:
        ranking = [r for r in ranking if not r.verified_only]
    if not ranking:
        return dispatch.spmm_pallas(a, b)
    engine = get_engine(a.format_name)
    return engine.variant(ranking[0].number).fn(a, b, config)
