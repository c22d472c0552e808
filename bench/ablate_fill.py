"""Fill-lever ablation: can row/column reordering raise strip fill?

VERDICT r4 #4: the headline kernel (pallas_panel on large_25605) is
MXU-pass-bound at ~1% strip fill, so the only way below the measured
0.136 ms compute floor is fewer executed MACs — i.e. denser strips.
Rows are already search-ordered (panel_spmm.ORDER_KINDS); this ablation
additionally evaluates COLUMN permutations (which would require the
inverse permutation applied to B's rows at serve time — priced below)
across every clustering family that is computable at plan-build cost:

- ``row:*``          — the three existing row-order candidates.
- ``col:centroid``   — columns sorted by mean row index of their nnz.
- ``col:first+cent`` — columns lexsorted by (first row, centroid).
- ``rcm:both``       — reverse Cuthill-McKee on the bipartite graph
                       (bandwidth-minimising row AND column order).
- ``col:first_touch``— columns renumbered in first-appearance order of a
                       natural row scan (locality by construction).
- ``col:tile_pack``  — first-touch with tile awareness: a row's new
                       columns never straddle a k-tile boundary.
- ``col:cooccur``    — greedy 128-column tile growing by row-set overlap
                       (directly maximises nnz per (strip, k-tile)).
  Each column family is also combined with the best row re-sort under
  the new column order.

Every strategy gets: occupied (strip, k-tile) groups, padded strips,
plan MB, strip fill, and the MODELLED serve time under the fitted v5e
constants (dispatch._CHIP_THRESHOLDS) — plus the serve-time price of
permuting B's rows (one extra HBM pass over B) for column strategies.
An extended geometry-grid scan (P down to 2, tm up to 128, tk up to
1024 — beyond the production candidate sets) closes the "is the floor
an artifact of the candidate grid?" question.

Usage::

    python -m bench.ablate_fill [--case large_25605] [--width 256]
        [--out results/ablate_fill.jsonl]

Host-only (no TPU needed): strips/bytes are exact plan-build math, the
model constants are the round-4 on-chip fit, and results/ablate_panel_r4
already measured the served geometries flat at 0.14±0.01 ms.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _strip_stats(rows, cols, k, tm, tk, P, val_bytes):
    from tpuspmm.kernels.panel_spmm import (
        _occupied_strip_groups, _st_strip_counts_from_groups, _padded_strips)

    nkt = max(1, -(-int(k) // tk))
    ktile = cols // tk
    g = _occupied_strip_groups(rows, ktile, nkt, tm)
    cnt, _ = _st_strip_counts_from_groups(g, nkt, 1 << 30)
    s = _padded_strips(cnt, P)
    return len(g), s, s * tm * tk * val_bytes


def _col_candidates(rows, cols, m, k, tk):
    """(name, colnum, row_inv) column-permutation candidates.  ``colnum``
    is the FORWARD map (original column c serves at position colnum[c];
    B's rows are gathered by the inverse at serve time); ``row_inv`` is a
    forward row map when the family reorders rows too, else None."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    def inv_of(perm, n):
        inv = np.empty(n, np.int64)
        inv[np.asarray(perm, np.int64)] = np.arange(n)
        return inv

    out = []
    ccent = np.zeros(k)
    cnum = np.zeros(k)
    np.add.at(ccent, cols, rows)
    np.add.at(cnum, cols, 1)
    ccent = np.where(cnum > 0, ccent / np.maximum(cnum, 1), np.inf)
    out.append(("col:centroid",
                inv_of(np.argsort(ccent, kind="stable"), k), None))

    cfirst = np.full(k, np.inf)
    np.minimum.at(cfirst, cols, rows)
    out.append(("col:first+cent",
                inv_of(np.lexsort((ccent, cfirst)), k), None))

    A = sp.coo_matrix((np.ones(len(rows)), (rows, cols)),
                      shape=(m, k)).tocsr()
    B = sp.bmat([[None, A], [A.T, None]]).tocsr()
    p = reverse_cuthill_mckee(B, symmetric_mode=True)
    out.append(("rcm:both", inv_of(p[p >= m] - m, k),
                inv_of(p[p < m], m)))

    indptr, indices = A.indptr, A.indices

    def first_touch(tile_aware: bool):
        colnum = np.full(k, -1, np.int64)
        nxt = 0
        for r in range(m):
            cs = indices[indptr[r]:indptr[r + 1]]
            new = cs[colnum[cs] < 0]
            if len(new) == 0:
                continue
            if tile_aware:
                rem = tk - (nxt % tk)
                if len(new) > rem and len(new) <= tk:
                    nxt += rem  # keep this row's new columns in ONE tile
            colnum[new] = np.arange(nxt, nxt + len(new))
            nxt += len(new)
        un = np.flatnonzero(colnum < 0)
        colnum[un] = np.arange(nxt, nxt + len(un))
        return colnum

    out.append(("col:first_touch", first_touch(False), None))
    out.append(("col:tile_pack", first_touch(True), None))

    # greedy co-occurrence tile packing: grow each 128-column tile by the
    # column sharing the most rows with the tile so far
    AT = A.T.tocsr()
    deg = np.diff(AT.indptr)
    score = np.zeros(k)
    assigned = np.zeros(k, bool)
    cnum2 = np.empty(k, np.int64)
    nxt = 0
    while nxt < k:
        score[:] = 0
        cur = int(np.argmax(np.where(assigned, -1, deg)))
        cap = min(tk, k - nxt)
        for _ in range(cap):
            assigned[cur] = True
            cnum2[cur] = nxt
            nxt += 1
            for r in AT.indices[AT.indptr[cur]:AT.indptr[cur + 1]]:
                score[indices[indptr[r]:indptr[r + 1]]] += 1
            masked = np.where(assigned, -np.inf, score)
            cur = int(np.argmax(masked))
            if not np.isfinite(masked[cur]) or masked[cur] <= 0:
                cur = int(np.argmax(np.where(assigned, -1, deg)))
    out.append(("col:cooccur", cnum2, None))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--case", default="large_25605")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--tm", type=int, default=16)
    p.add_argument("--tk", type=int, default=128)
    p.add_argument("--strips", type=int, default=8, help="P")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from tpuspmm.data import data_dir as resolve_dir
    from tpuspmm.formats import convert
    from tpuspmm.kernels.panel_spmm import (
        ORDER_KINDS, _order_candidates, _geometry_search,
        plan_values_bf16_exact)
    from tpuspmm.kernels.dispatch import thresholds

    a = convert.load_sparse(resolve_dir(args.case) or args.case, "csr")
    coo = a.to_coo()
    rows = np.asarray(coo.rows, np.int64)
    cols = np.asarray(coo.cols, np.int64)
    m, k = a.shape
    nnz = len(rows)
    tm, tk, P = args.tm, args.tk, args.strips
    th = thresholds()
    step_us = th["panel_step_us"]
    strip_us = th["panel_strip_us"]
    bw = th["panel_hbm_gbps"] * 1e3  # bytes/µs
    val_bytes = 2 if plan_values_bf16_exact(rows, cols,
                                            np.asarray(coo.values), k) else 4
    # serve-time price of permuting B's rows (column strategies only):
    # one read + one write of B through the row-gather path
    b_perm_us = 2 * k * args.width * 4 / (th["panel_gather_gbps"] * 1e3)

    out_stream = open(args.out, "w") if args.out else sys.stdout
    records = []

    def emit(strategy, r, c, *, col_permuted, note=""):
        groups, strips, plan_bytes = _strip_stats(r, c, k, tm, tk, P,
                                                  val_bytes)
        model_us = (strips * (tm * tk * val_bytes / bw + strip_us)
                    + (strips // P) * step_us
                    + (b_perm_us if col_permuted else 0.0))
        rec = {
            "bench": "ablate_fill", "testcase": args.case,
            "strategy": strategy, "tm": tm, "tk": tk, "P": P,
            "groups": int(groups), "paddedStrips": int(strips),
            "planMB": round(plan_bytes / 1e6, 3),
            "fill": round(nnz / (strips * tm * tk), 5),
            "modelledMs": round(model_us / 1e3, 4),
            "bPermChargedMs": round(b_perm_us / 1e3, 4) if col_permuted
            else 0.0,
            "bCols": args.width, "note": note,
        }
        records.append(rec)
        print(json.dumps(rec), file=out_stream, flush=True)

    emit("natural", rows, cols, col_permuted=False)
    ktile = cols // tk
    for kind, perm in zip(ORDER_KINDS,
                          _order_candidates(rows, cols, m, ktile)):
        inv = np.empty(m, np.int64)
        inv[perm] = np.arange(m)
        emit(f"row:{kind}", inv[rows], cols, col_permuted=False)

    for name, colnum, row_fwd in _col_candidates(rows, cols, m, k, tk):
        r = rows if row_fwd is None else row_fwd[rows]
        c2 = colnum[cols]
        emit(name, r, c2, col_permuted=True)
        # best row re-sort under the new column order
        kt2 = c2 // tk
        best = None
        for kind, perm in zip(ORDER_KINDS,
                              _order_candidates(r, c2, m, kt2)):
            inv = np.empty(m, np.int64)
            inv[perm] = np.arange(m)
            _, s, _ = _strip_stats(inv[r], c2, k, tm, tk, P, val_bytes)
            if best is None or s < best[1]:
                best = (kind, s, inv)
        emit(f"{name}+row:{best[0]}", best[2][r], c2, col_permuted=True)

    # extended geometry-grid scan under the natural order: is the floor
    # an artifact of the production candidate sets?
    scan = _geometry_search(
        rows, cols, m, k, (8, 16, 32, 64, 128), (128, 256, 512, 1024),
        (2, 4, 8, 16, 32, 64), n_pad=-(-args.width // 128) * 128,
        budget_bytes=8 * 1024 * 1024, plan_bytes_cap=128 * 1024 * 1024,
        step_us=step_us, strip_us=strip_us, hbm_gbps=th["panel_hbm_gbps"],
        val_bytes=val_bytes, topk=5)
    for Pc, perm, sm, pb, tmc, kind, tkc, cost in scan:
        rec = {"bench": "ablate_fill", "testcase": args.case,
               "strategy": "geometry_scan", "tm": tmc, "tk": tkc, "P": Pc,
               "sm": int(sm), "order": kind,
               "planMB": round(pb / 1e6, 3),
               "modelledMs": round(cost / 1e3, 4), "bCols": args.width}
        records.append(rec)
        print(json.dumps(rec), file=out_stream, flush=True)

    nat = records[0]
    best_alt = min((r for r in records[1:] if "fill" in r),
                   key=lambda r: r["paddedStrips"])
    print(f"# natural: {nat['paddedStrips']} strips, fill {nat['fill']}; "
          f"best alternative {best_alt['strategy']}: "
          f"{best_alt['paddedStrips']} strips "
          f"({best_alt['paddedStrips'] / nat['paddedStrips']:.2f}x)",
          file=sys.stderr)
    if args.out:
        out_stream.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
