"""Build + verify the repo's self-contained data corpus.

The reference ships 12 curated SuiteSparse-derived data dirs and golden
fixtures (reference/data/*, reference/test/csr.sh:3-14); its two hardest
inputs are missing git-LFS blobs (reference/.MISSING_LARGE_BLOBS:1-4).
This tool makes the repo's `data/` tree stand on its own:

1. regenerate deterministic replacements for the reference's missing
   blobs (medium_4096's sparse operand: 4096x4096, 12264 nnz — the dims
   recorded in SURVEY.md §2.3);
2. write `result.expect` goldens (scipy float64 oracle, the reference
   validate.py contract, reference/utils/python_utils/validate.py:18-29)
   for every dir whose dense operand is on disk;
3. verify the whole tree: every stored format of every dir must load,
   agree with the scipy oracle at rel 1e-2 / abs 1e-3, and match the
   committed golden if present.

Usage::

    python -m tpuspmm.tools.make_data [--data-root data] [--verify-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# dirs × expected (rows, cols, nnz) of the sparse operand — SURVEY.md §2.3
EXPECTED = {
    "small_10x10": (10, 10, 90),
    "small_32x32": (32, 32, 98),
    "small_210": (120, 210, 840),
    "medium_1484": (1484, 1484, 6110),
    "medium_2048": (2048, 2048, 10114),
    "medium_2880": (2880, 2880, 19635),
    "medium_4000": (4000, 4000, 8784),
    "medium_4096": (4096, 4096, 12264),
    "large_15120": (5040, 15120, 30240),
    "large_20000": (20000, 20000, 137736),
    "large_21074": (2798, 21074, 81671),
    "large_25605": (6300, 25605, 88200),
}

# goldens are only written where the full dense operand is small enough to
# keep the .expect text fixture in the tens of KB
GOLDEN_DIRS = ("small_10x10", "small_32x32", "small_210")


def regen_medium_4096(root: str) -> None:
    """The reference's HFE18_96_in.mtx is a missing blob; synthesise a
    deterministic stand-in with the recorded dims (4096^2, 12264 nnz) in
    all four text formats so every engine sweeps it."""
    from tpuspmm.formats import CSR, convert

    d = os.path.join(root, "medium_4096")
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, "gen_HFE18_96_in_rowind.ell")
    if os.path.exists(marker):
        return
    rows, cols, nnz = EXPECTED["medium_4096"]
    density = nnz / (rows * cols)
    a = CSR.random(rows, cols, density, seed=4096, lo=-1.0, hi=1.0)
    written = convert.write_all_formats(a, d, stem="gen_HFE18_96_in")
    with open(os.path.join(d, "GENERATED.json"), "w") as f:
        json.dump({"files": sorted(os.path.basename(p) for p in written),
                   "seed": 4096, "shape": [rows, cols], "nnz": int(a.nnz),
                   "note": "deterministic stand-in for the reference's "
                           "missing HFE18_96_in.mtx blob"}, f, indent=1)
    print(f"# generated medium_4096 stand-in ({rows}x{cols}, nnz={a.nnz}): "
          f"{len(written)} files")


def write_goldens(root: str) -> None:
    from tpuspmm.formats import convert
    from tpuspmm.ops import oracle

    for name in GOLDEN_DIRS:
        d = os.path.join(root, name)
        if not os.path.isdir(d):
            continue
        path = os.path.join(d, "result.expect")
        if os.path.exists(path):
            continue
        a = convert.load_sparse(d, "csr")
        b = np.asarray(convert.load_dense(d).data, dtype=np.float32)
        ref = oracle.spmm_scipy_oracle(a, b)
        np.savetxt(path, ref, fmt="%.10f")
        print(f"# wrote {path}")


def verify(root: str) -> int:
    from tpuspmm.formats import convert
    from tpuspmm.ops import oracle
    from tpuspmm.utils.compare import allclose

    failures = 0
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        if not os.path.isdir(d):
            continue
        try:
            a = convert.load_sparse(d, "csr")
        except FileNotFoundError:
            print(f"{name}: SKIP (no sparse input)")
            continue
        exp = EXPECTED.get(name)
        dims_ok = exp is None or (a.shape == exp[:2] and a.nnz == exp[2])
        # non-golden dirs verify against a synthetic narrow operand — the
        # on-disk dense blobs run to K x K (large_20000: 20000^2) and the
        # format cross-check doesn't need them
        width = None if name in GOLDEN_DIRS else 64
        b = np.asarray(
            convert.load_dense(d, width=width,
                               force_synthetic=width is not None).data,
            dtype=np.float32)
        ref = oracle.spmm_scipy_oracle(a, b)
        fmt_ok = True
        for fmt in ("coo", "bsr", "ell"):
            try:
                af = convert.load_sparse(d, fmt)
            except FileNotFoundError:
                continue
            out = oracle.spmm_oracle(af, b)
            if not allclose(out, ref, 1e-2, 1e-3):
                fmt_ok = False
                failures += 1
                print(f"{name}: FORMAT MISMATCH ({fmt})")
        golden_ok = True
        gpath = os.path.join(d, "result.expect")
        if os.path.exists(gpath) and width is None:
            golden = np.loadtxt(gpath, dtype=np.float64).reshape(ref.shape)
            golden_ok = allclose(ref.astype(np.float32),
                                 golden.astype(np.float32), 1e-2, 1e-3)
            if not golden_ok:
                failures += 1
        status = "ok" if (dims_ok and fmt_ok and golden_ok) else "FAIL"
        if not dims_ok:
            failures += 1
        print(f"{name}: {status} shape={a.shape} nnz={a.nnz}"
              + ("" if dims_ok else f" (expected {exp})")
              + ("" if golden_ok else " GOLDEN MISMATCH"))
    return failures


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "data"))
    p.add_argument("--verify-only", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.data_root, exist_ok=True)
    if not args.verify_only:
        regen_medium_4096(args.data_root)
        write_goldens(args.data_root)
    failures = verify(args.data_root)
    print(f"# {'OK' if failures == 0 else 'FAILURES'} ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
