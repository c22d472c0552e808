"""Autotuner: measure the admissible strategies once, serve the winner.

The dispatch heuristics (tpuspmm/kernels/dispatch.py) are fitted averages;
for a serving workload that will execute the same SpMM millions of times,
it is worth paying one measurement pass per (matrix, width) to pick the
true winner.  ``tune`` times every admissible engine variant with the
chained device timer and caches the result on the container;
``spmm(a, b, method="tuned")`` serves the cached winner (tuning on first
use).

The reference has no analogue — its kernel choice is the CLI user's job —
but cuSPARSE's ALG_DEFAULT autotuning plays this role in production CUDA
stacks.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class TuneResult:
    variant_name: str
    number: int
    ms: float


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


def tune(a, b, iters: int = 8, config=None, verbose: bool = False) -> List[TuneResult]:
    """Measure every admissible variant of `a`'s format engine; cache and
    return the ranking (fastest first)."""
    import jax.numpy as jnp

    from tpuspmm.config import default_config
    from tpuspmm.engine.registry import get_engine
    from tpuspmm.utils.timing import device_time_ms

    config = config or default_config()
    a = _as_tunable(a)
    engine = get_engine(a.format_name)
    b_dev = jnp.asarray(b, dtype=jnp.float32)
    results: List[TuneResult] = []
    for variant in engine.variants:
        if variant.admissible is not None and not variant.admissible(a, b_dev, config):
            continue
        try:
            variant.fn(a, b_dev, config)  # warm caches/compile outside timing
            ms = device_time_ms(lambda bb, v=variant: v.fn(a, bb, config),
                                b_dev, iters=iters)
        except Exception as e:
            if verbose:
                print(f"# tune: {variant.name} failed: {type(e).__name__}: {e}")
            continue
        results.append(TuneResult(variant.name, variant.number, round(ms, 4)))
        if verbose:
            print(f"# tune: {variant.name}: {ms:.3f} ms")
    results.sort(key=lambda r: r.ms)

    cache = getattr(a, "_tune_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(a, "_tune_cache", cache)
        except Exception:
            cache = None
    if cache is not None and results:
        cache[_tune_key(b)] = results
    return results


def spmm_tuned(a, b, config=None):
    """SpMM through the tuned winner for this (matrix, width); tunes on
    first use, falls back to the dispatch heuristic if tuning failed."""
    from tpuspmm.config import default_config
    from tpuspmm.engine.registry import get_engine
    from tpuspmm.kernels import dispatch

    config = config or default_config()
    a = _as_tunable(a)
    cache = getattr(a, "_tune_cache", None) or {}
    ranking = cache.get(_tune_key(b))
    if ranking is None:
        ranking = tune(a, b, config=config)
    if not ranking:
        return dispatch.spmm_pallas(a, b)
    engine = get_engine(a.format_name)
    return engine.variant(ranking[0].number).fn(a, b, config)
