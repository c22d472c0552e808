"""Cross-format conversion and data-directory discovery.

Conversion parity with the reference's offline Python tooling
(reference/utils/python_utils/convert_mtx.py, convert_matrix.py) plus the
in-binary `toDense` methods; discovery parity with the CLI's extension scan
(reference/src/main.cu:98-144: `.csr`, `.coo`, `.bsr`, `*_rowind.ell`,
`*_values_colmajor.ell`, `dense.in`).  Beyond the reference, `.mtx` files are
loadable directly (the reference needs an offline conversion pass first).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from tpuspmm.formats.csr import CSR
from tpuspmm.formats.csc import CSC
from tpuspmm.formats.coo import COO
from tpuspmm.formats.bsr import BSR
from tpuspmm.formats.ell import ELL
from tpuspmm.formats.dense import DenseMatrix
from tpuspmm.formats import io as fio


def to_format(matrix, fmt: str, block_size=(4, 4)):
    """Convert any container (or scipy matrix / dense ndarray) to `fmt`."""
    import scipy.sparse

    if isinstance(matrix, (CSR, CSC, COO, BSR, ELL)):
        sp = matrix.to_scipy() if hasattr(matrix, "to_scipy") else scipy.sparse.coo_matrix(matrix.to_dense())
    elif scipy.sparse.issparse(matrix):
        sp = matrix
    else:
        sp = scipy.sparse.csr_matrix(np.asarray(matrix))

    fmt = fmt.lower()
    if fmt == "csr":
        return CSR.from_scipy(sp)
    if fmt == "csc":
        return CSC.from_scipy(sp)
    if fmt == "coo":
        return COO.from_scipy(sp)
    if fmt == "bsr":
        return BSR.from_scipy(sp, block_size=block_size)
    if fmt == "ell":
        return ELL.from_scipy(sp)
    raise ValueError(f"unknown format {fmt!r}")


def discover(data_dir: str) -> Dict[str, Optional[str]]:
    """Scan a data directory for the reference's file kinds
    (reference/src/main.cu:98-144)."""
    found: Dict[str, Optional[str]] = {
        "csr": None, "csc": None, "coo": None, "bsr": None,
        "ell_rowind": None, "ell_values": None,
        "dense": None, "mtx": None, "dense_mtx": None,
    }
    for name in sorted(os.listdir(data_dir)):
        p = os.path.join(data_dir, name)
        if name.endswith("_rowind.ell"):
            found["ell_rowind"] = p
        elif name.endswith("_values_colmajor.ell"):
            found["ell_values"] = p
        elif name.endswith(".csr"):
            found["csr"] = p
        elif name.endswith(".csc"):
            found["csc"] = p
        elif name.endswith(".coo"):
            found["coo"] = p
        elif name.endswith(".bsr"):
            found["bsr"] = p
        elif name == "dense.in":
            found["dense"] = p
        elif name == "dense.mtx":
            found["dense_mtx"] = p
        elif name.endswith(".mtx"):
            found["mtx"] = p
    return found


def write_all_formats(a, data_dir: str, stem: str, block_size: int = 4) -> list:
    """Write a container to `data_dir` in all four reference text formats
    (`.csr`, `.coo`, `.bsr`, the col-major ELL pair) — the per-container
    twin of tools.convert_mtx.convert_dir.  Returns the files written."""
    import scipy.sparse

    sp = scipy.sparse.coo_matrix(a.to_scipy())
    base = os.path.join(data_dir, stem)
    written = []
    CSR.from_scipy(sp).save(base + ".csr")
    written.append(base + ".csr")
    COO.from_scipy(sp).sort_by_row().save(base + ".coo")
    written.append(base + ".coo")
    bs = block_size
    while bs > 1 and (sp.shape[0] % bs or sp.shape[1] % bs):
        bs -= 1
    BSR.from_scipy(sp, block_size=(bs, bs)).save(base + ".bsr")
    written.append(base + ".bsr")
    ELL.from_scipy(sp).save(base + "_rowind.ell", base + "_values_colmajor.ell")
    written += [base + "_rowind.ell", base + "_values_colmajor.ell"]
    return written


def load_sparse(data_dir: str, fmt: str, block_size=(4, 4)):
    """Load the sparse operand of `data_dir` in the requested format,
    preferring the reference's pre-converted text file, falling back to
    direct `.mtx` conversion."""
    f = discover(data_dir)
    fmt = fmt.lower()
    if fmt == "csr" and f["csr"]:
        return CSR.from_file(f["csr"])
    if fmt == "csc" and f["csc"]:
        return CSC.from_file(f["csc"])
    if fmt == "coo" and f["coo"]:
        return COO.from_file(f["coo"])
    if fmt == "bsr" and f["bsr"]:
        return BSR.from_file(f["bsr"])
    if fmt == "ell" and f["ell_rowind"] and f["ell_values"]:
        return ELL.from_file(f["ell_rowind"], f["ell_values"])
    if f["mtx"]:
        return to_format(fio.read_mtx(f["mtx"]), fmt, block_size=block_size)
    raise FileNotFoundError(f"no {fmt} (or .mtx) input in {data_dir}")


def load_dense(data_dir: str, width: Optional[int] = None, seed: int = 0,
               force_synthetic: bool = False) -> DenseMatrix:
    """Load the dense operand: `dense.in` preferred, then `dense.mtx`.
    If neither exists (the reference's missing-blob dirs,
    reference/.MISSING_LARGE_BLOBS:1-4) — or ``force_synthetic`` is set
    (e.g. the on-disk operand is too wide for the environment) — a
    deterministic random operand of the requested width is synthesised."""
    f = discover(data_dir)
    if force_synthetic:
        f = dict(f, dense=None, dense_mtx=None)

    def _tagged(d: DenseMatrix, source: str) -> DenseMatrix:
        # operand-provenance tag for bench records (bSource field):
        # "ondisk" = reference-shipped operand, "synth" = generated here.
        # Attribute, not a dataclass field — containers are frozen pytrees
        # and the tag must not affect tree structure or equality.
        object.__setattr__(d, "b_source", source)
        return d

    if f["dense"]:
        return _tagged(DenseMatrix.from_file(f["dense"]), "ondisk")
    if f["dense_mtx"]:
        m = fio.read_mtx(f["dense_mtx"])
        import scipy.sparse

        arr = m.toarray() if scipy.sparse.issparse(m) else np.asarray(m)
        return _tagged(DenseMatrix.from_array(arr), "ondisk")
    if f["mtx"] or f["csr"] or f["coo"]:
        # Synthesise a B matching A's column count.
        a = load_sparse(data_dir, "coo") if f["coo"] or f["mtx"] else load_sparse(data_dir, "csr")
        k = a.shape[1]
        n = width or min(k, 512)
        rng = np.random.default_rng(seed)
        return _tagged(DenseMatrix.from_array(
            rng.uniform(-1.0, 1.0, (k, n)).astype(np.float32)), "synth")
    raise FileNotFoundError(f"no dense operand in {data_dir}")
