"""Vendor-baseline SpMM via `jax.experimental.sparse`.

Plays exactly the role cuSPARSE plays in the reference: a library-provided
path that is timed and reported as kernel number -1
(reference/src/engine/cusparse.cu:10-57, reference/src/engine/engine.cpp:47-55).
The reference pairs CSR with `CUSPARSE_SPMM_CSR_ALG2` and COO with
`CUSPARSE_SPMM_COO_ALG4` (reference/src/formats/sparse_csr.cu:182-185,
sparse_coo.cu:97-100) and has no vendor path for BSR/ELL
(engine_bsr.hpp:24, engine_ell.hpp:27); here every format gets a vendor path
by lowering to BCOO/BCSR.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import sparse as jsparse

_bcsr_warned = False


@jax.jit
def _bcoo_spmm(a_bcoo, b):
    return a_bcoo @ b


def supports_vendor(fmt: str) -> bool:
    return fmt in ("csr", "coo", "bsr", "ell")


def _vendor_cached(a, key, build):
    cache = getattr(a, "_vendor_cache", None)
    if cache is None:
        cache = {}
        try:
            object.__setattr__(a, "_vendor_cache", cache)
        except Exception:
            return build()
    if key not in cache:
        cache[key] = build()
    return cache[key]


def to_bcoo(a) -> "jsparse.BCOO":
    """Lower any container to BCOO (duplicates summed, matching COO
    accumulate semantics).  Cached on the container — the lowering is the
    vendor path's prolog, paid once like cuSPARSE descriptor setup
    (reference/src/engine/cusparse.cu:19-31)."""
    from tpuspmm.formats import CSR, COO, BSR, ELL

    def build():
        if isinstance(a, COO):
            coo = a
        elif isinstance(a, CSR):
            coo = a.to_coo()
        elif isinstance(a, (BSR, ELL)):
            coo = a.to_csr().to_coo() if isinstance(a, BSR) else a.to_coo()
        elif hasattr(a, "to_coo"):  # CSC and future formats
            coo = a.to_coo()
        else:
            raise TypeError(type(a))
        idx = np.stack([np.asarray(coo.rows), np.asarray(coo.cols)], axis=1).astype(np.int32)
        m = jsparse.BCOO((jnp.asarray(coo.values), jnp.asarray(idx)), shape=coo.shape)
        return m.sum_duplicates(nse=m.nse)

    return _vendor_cached(a, "bcoo", build)


def to_bcsr(a) -> "jsparse.BCSR":
    """Lower a CSR container to BCSR — the analogue of the reference pairing
    CSR with `CUSPARSE_SPMM_CSR_ALG2` (reference/src/formats/sparse_csr.cu:182-185)."""
    def build():
        return jsparse.BCSR(
            (jnp.asarray(np.asarray(a.values)),
             jnp.asarray(np.asarray(a.indices)),
             jnp.asarray(np.asarray(a.indptr))),
            shape=a.shape,
        )

    return _vendor_cached(a, "bcsr", build)


def last_lowering(a) -> str:
    """Which vendor lowering actually served the last spmm_vendor call for
    this container ("bcsr" or "bcoo") — surfaced in engine records so a
    silent BCSR regression can't quietly degrade the baseline."""
    return getattr(a, "_vendor_lowering", "")


def spmm_vendor(a, b):
    """Vendor-baseline SpMM (the -1 kernel).  CSR → BCSR when supported,
    everything else → BCOO (the reference likewise picks a per-format
    cuSPARSE algorithm)."""
    from tpuspmm.formats import CSR

    def note(lowering: str):
        try:
            object.__setattr__(a, "_vendor_lowering", lowering)
        except Exception:
            pass

    b = jnp.asarray(b)
    if isinstance(a, CSR):
        try:
            out = _bcoo_spmm(to_bcsr(a), b)
            note("bcsr")
            return out
        except Exception as e:
            global _bcsr_warned
            if not _bcsr_warned:
                _bcsr_warned = True
                warnings.warn(
                    f"vendor BCSR path failed ({type(e).__name__}: {e}); "
                    "falling back to BCOO — baseline comparisons will use "
                    "the BCOO lowering", RuntimeWarning)
    out = _bcoo_spmm(to_bcoo(a), b)
    note("bcoo")
    return out
