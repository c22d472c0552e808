"""Text-file I/O for the reference's on-disk formats.

The reference defines five custom text formats written by
`utils/python_utils/convert_mtx.py` and parsed by the C++ loaders:

- ``.csr``    — header "rows cols nnz"; indptr line; colidx line; values line
  (reference/src/formats/sparse_csr.cu:12-51).
- ``.coo``    — header "rows cols nnz"; nnz lines "row col value"
  (reference/src/formats/sparse_coo.cu:12-38).
- ``.bsr``    — header "rows cols nnz brows bcols nblocks"; indptr line;
  block-col-index line; nblocks lines of brows*bcols row-major block values
  (reference/src/formats/sparse_bsr.cu:17-61,
   reference/utils/python_utils/convert_matrix.py:7-60).
- ELL pair    — ``*_rowind.ell`` header "rows cols nnz maxColNnz" then
  numCols lines of maxColNnz row indices (-1 padding), plus headerless
  ``*_values_colmajor.ell`` with numCols lines of maxColNnz values
  (reference/src/formats/sparse_ell.cu:12-55,
   reference/utils/python_utils/convert_mtx.py:242-286).
- ``dense.in``— header "rows cols [ignored]"; rows lines of cols values
  (reference/src/formats/dense.cu:9-36 — only the first two header tokens
   are consumed).

Parsing is numpy-vectorised (``np.fromstring``-class speed); an optional
C++ fast path (tpuspmm/native) is used when built, standing in for the
reference's native mmio reader (reference/utils/utils/mmio.c).
"""

from __future__ import annotations

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native():
    """Lazily load the optional C++ fast-parse library."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from tpuspmm.native import fastio

            _NATIVE = fastio
        except Exception:
            _NATIVE = None
    return _NATIVE


def _numeric_body(path: str, skip_lines: int) -> np.ndarray:
    nat = _native()
    if nat is not None:
        try:
            return nat.parse_tokens(path, skip_lines)
        except Exception:
            pass
    with open(path, "r") as f:
        for _ in range(skip_lines):
            f.readline()
        rest = f.read()
    # token-stream parse: the text formats have ragged line lengths
    return np.array(rest.split(), dtype=np.float64)


# --------------------------------------------------------------------------
# readers
# --------------------------------------------------------------------------

def read_csr_text(path: str):
    with open(path) as f:
        rows, cols, nnz = (int(t) for t in f.readline().split()[:3])
    body = _numeric_body(path, 1)
    indptr = body[: rows + 1].astype(np.int32)
    indices = body[rows + 1 : rows + 1 + nnz].astype(np.int32)
    # NOTE: the reference loader reads nnz+1 col indices (off-by-one `<=` at
    # reference/src/formats/sparse_csr.cu:40) — we read exactly nnz.
    values = body[rows + 1 + nnz : rows + 1 + 2 * nnz].astype(np.float32)
    return (rows, cols), indptr, indices, values


def read_coo_text(path: str):
    with open(path) as f:
        rows, cols, nnz = (int(t) for t in f.readline().split()[:3])
    body = _numeric_body(path, 1).reshape(nnz, 3)
    r = body[:, 0].astype(np.int32)
    c = body[:, 1].astype(np.int32)
    v = body[:, 2].astype(np.float32)
    return (rows, cols), r, c, v


def read_bsr_text(path: str):
    with open(path) as f:
        toks = f.readline().split()
    rows, cols, nnz, brows, bcols, nblocks = (int(t) for t in toks[:6])
    body = _numeric_body(path, 1)
    nbr = rows // brows
    indptr = body[: nbr + 1].astype(np.int32)
    indices = body[nbr + 1 : nbr + 1 + nblocks].astype(np.int32)
    blocks = (
        body[nbr + 1 + nblocks : nbr + 1 + nblocks + nblocks * brows * bcols]
        .astype(np.float32)
        .reshape(nblocks, brows, bcols)
    )
    return (rows, cols), nnz, (brows, bcols), indptr, indices, blocks


def read_ell_text(rowind_path: str, values_path: str):
    """Column-major ELLPACK pair (the variant main.cu consumes,
    reference/src/main.cu:210)."""
    with open(rowind_path) as f:
        rows, cols, nnz, max_col_nnz = (int(t) for t in f.readline().split()[:4])
    rowind = (
        _numeric_body(rowind_path, 1)[: cols * max_col_nnz]
        .astype(np.int32)
        .reshape(cols, max_col_nnz)
    )
    values = (
        _numeric_body(values_path, 0)[: cols * max_col_nnz]
        .astype(np.float32)
        .reshape(cols, max_col_nnz)
    )
    return (rows, cols), nnz, max_col_nnz, rowind, values


def read_dense_text(path: str) -> np.ndarray:
    with open(path) as f:
        toks = f.readline().split()
    rows, cols = int(toks[0]), int(toks[1])
    body = _numeric_body(path, 1)
    return body[: rows * cols].astype(np.float32).reshape(rows, cols)


def read_mtx(path: str):
    """MatrixMarket reader → scipy sparse COO (or dense ndarray).

    Equivalent of the reference's NIST mmio tool
    (reference/utils/utils/mmio.c, read_matrix.cpp:8-98); `pattern`
    matrices get value 1.0 and indices shift 1→0-based, both of which
    scipy.io.mmread already honours.
    """
    import scipy.io
    import scipy.sparse

    nat = _native()
    if nat is not None:
        try:
            shape, r, c, v = nat.read_mtx_triplets(path)
            return scipy.sparse.coo_matrix(
                (v.astype(np.float64), (r, c)), shape=shape
            )
        except Exception:
            pass  # dense/skew/unsupported banner → scipy
    m = scipy.io.mmread(path)
    return m


# --------------------------------------------------------------------------
# writers (converter outputs — parity with convert_matrix.py savers)
# --------------------------------------------------------------------------

def write_csr_text(path: str, shape, indptr, indices, values):
    """reference/utils/python_utils/convert_matrix.py:63-93 format."""
    with open(path, "w") as f:
        f.write(f"{shape[0]} {shape[1]} {len(values)}\n")
        f.write(" ".join(map(str, np.asarray(indptr).tolist())) + "\n")
        f.write(" ".join(map(str, np.asarray(indices).tolist())) + "\n")
        np.savetxt(f, np.asarray(values)[None, :], fmt="%.9g")


def write_coo_text(path: str, shape, rows, cols, values):
    """Row-major sorted triplets (reference convert_matrix.py:97-116)."""
    order = np.lexsort((cols, rows))
    with open(path, "w") as f:
        f.write(f"{shape[0]} {shape[1]} {len(values)}\n")
        np.savetxt(f, np.column_stack([np.asarray(rows)[order],
                                       np.asarray(cols)[order],
                                       np.asarray(values)[order]]),
                   fmt=["%d", "%d", "%.9g"])


def write_bsr_text(path: str, shape, nnz, block_size, indptr, indices, blocks):
    """reference convert_matrix.py:7-60 format."""
    brows, bcols = block_size
    with open(path, "w") as f:
        f.write(f"{shape[0]} {shape[1]} {nnz} {brows} {bcols} {len(indices)}\n")
        f.write(" ".join(map(str, np.asarray(indptr).tolist())) + "\n")
        f.write(" ".join(map(str, np.asarray(indices).tolist())) + "\n")
        flat = np.asarray(blocks).reshape(len(indices), -1) if len(indices) else np.zeros((0, 1))
        np.savetxt(f, flat, fmt="%.9g")


def write_ell_text(rowind_path: str, values_path: str, shape, nnz, max_col_nnz, rowind, values):
    """Column-major ELL pair (reference convert_mtx.py:242-286)."""
    with open(rowind_path, "w") as f:
        f.write(f"{shape[0]} {shape[1]} {nnz} {max_col_nnz}\n")
        for col in np.asarray(rowind):
            f.write(" ".join(map(str, col.tolist())) + "\n")
    with open(values_path, "w") as f:
        np.savetxt(f, np.asarray(values), fmt="%.9g")


def write_ell_rowmajor_text(colind_path: str, values_path: str, shape, nnz, max_row_nnz, colind, values):
    """Row-major ELL pair ``*_colind.ell`` + ``*_values.ell`` — the second
    orientation the reference converter emits (reference
    utils/python_utils/convert_mtx.py:195-239; unused by its binary but part
    of the tooling surface)."""
    with open(colind_path, "w") as f:
        f.write(f"{shape[0]} {shape[1]} {nnz} {max_row_nnz}\n")
        for row in np.asarray(colind):
            f.write(" ".join(map(str, row.tolist())) + "\n")
    with open(values_path, "w") as f:
        np.savetxt(f, np.asarray(values), fmt="%.9g")


def write_dense_text(path: str, dense: np.ndarray):
    """dense.in writer (reference convert_mtx.py:63-96; the third header
    token is the dense nnz count, which the reference loader ignores)."""
    dense = np.asarray(dense)
    with open(path, "w") as f:
        f.write(f"{dense.shape[0]} {dense.shape[1]} {int(np.count_nonzero(dense))}\n")
        np.savetxt(f, dense, fmt="%.9g")
