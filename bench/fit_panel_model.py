"""Fit the panel cost-model constants from on-chip ablation records.

The geometry search (tpuspmm/kernels/panel_spmm._geometry_search) prices a
candidate as

    ms = steps * step_us
       + strips * strip_bytes / (hbm_gbps * 1e3)   # plan stream
       + strips * strip_us                         # per-strip RMW chain
       + perm * m * n * 8 / (gather_gbps * 1e3)    # C un-permute gather

with the four per-chip constants in kernels/dispatch.py _CHIP_THRESHOLDS.
The v5e ``panel_strip_us`` row is EXTRAPOLATED (dispatch.py notes) — this
tool turns a measured ``bench.ablate_panel --tm ...`` sweep into fitted
constants via non-negative least squares, so refits are one command:

    python -m bench.ablate_panel large_25605 large_21074 large_20000 \
        medium_4096 --tm 8,16,32 --repeats 16 > results/ablate_panel_tm.jsonl
    python -m bench.fit_panel_model results/ablate_panel_tm.jsonl

Prints one JSON line with the fitted constants, their residual, and the
record count; only gate-passing ``mode=="highest"`` records are used
(split tiers change the per-panel matmul count, not the traffic model).
The fit needs geometry DIVERSITY — at least records from a --tm sweep or
a --strips sweep; a single geometry per matrix is rank-deficient and the
tool says so instead of printing garbage.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def fit(records):
    """records -> (constants dict, residual_ms_rms, n_used).

    Raises ValueError when the design matrix is rank-deficient (not
    enough geometry diversity to identify the four constants)."""
    rows, y = [], []
    for r in records:
        if r.get("mode") != "highest" or not r.get("correct"):
            continue
        if not all(k in r for k in
                   ("strips", "steps", "strip_bytes", "ms", "m", "n")):
            continue
        perm = 1.0 if r.get("perm") else 0.0
        rows.append([
            float(r["steps"]),                          # * step_us
            float(r["strips"] * r["strip_bytes"]),      # * us_per_byte
            float(r["strips"]),                         # * strip_us
            perm * float(r["m"] * r["n"] * 8),          # * us_per_gather_byte
        ])
        y.append(float(r["ms"]) * 1e3)                  # µs
    if len(rows) < 4:
        raise ValueError(f"only {len(rows)} usable records — need >= 4")
    A = np.asarray(rows)
    used = A.any(axis=0)  # e.g. no permuted record -> drop the gather col
    if np.linalg.matrix_rank(A[:, used]) < int(used.sum()):
        raise ValueError(
            "rank-deficient design matrix — run ablate_panel with a --tm "
            "and/or --strips sweep so geometries vary independently")
    from scipy.optimize import nnls

    coef = np.zeros(A.shape[1])
    coef[used], _ = nnls(A[:, used], np.asarray(y))
    resid = A @ coef - np.asarray(y)
    step_us, us_per_byte, strip_us, us_per_gb = coef
    out = {
        "panel_step_us": round(step_us, 4),
        "panel_hbm_gbps": (round(1.0 / (us_per_byte * 1e3), 1)
                           if us_per_byte > 0 else None),
        "panel_strip_us": round(strip_us, 5),
        "panel_gather_gbps": (round(1.0 / (us_per_gb * 1e3), 1)
                              if us_per_gb > 0 else None),
    }
    return out, float(np.sqrt(np.mean(resid ** 2)) / 1e3), len(rows)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("jsonl", nargs="+",
                   help="ablate_panel output file(s) (JSONL) — multiple "
                        "same-session files pool into one fit")
    args = p.parse_args(argv)
    records = []
    for path in args.jsonl:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    records.append(json.loads(line))
    try:
        constants, rms_ms, n = fit(records)
    except ValueError as e:
        print(json.dumps({"error": str(e)}))
        return 1
    print(json.dumps({"fitted": constants, "residual_rms_ms": round(rms_ms, 4),
                      "records_used": n,
                      "note": ("paste non-None values into "
                               "kernels/dispatch.py _CHIP_THRESHOLDS for the "
                               "measured chip; None = term not identifiable "
                               "from these records")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
