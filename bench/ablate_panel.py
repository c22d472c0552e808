"""Panel-geometry ablation: time the auto-resolved geometry against
pinned strip counts (P) in both precision modes, with chained device
timing.  Used to validate the geometry cost model's picks on real
hardware after plan-format changes (bf16 compaction, row reordering) and
to refit the per-chip constants in kernels/dispatch.py when they drift.

Prints one JSON line per (matrix, geometry, mode); ``correct`` reflects
the rel 1e-2 / abs 1e-3 gate (reference/include/utils.hpp:10-11).

Usage::

    python -m bench.ablate_panel [large_25605 large_21074 ...]
        [--width 256] [--repeats 16] [--strips 16,32,64]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("cases", nargs="*",
                   default=["large_25605", "large_21074", "large_20000",
                            "medium_4096", "large_15120"])
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--repeats", type=int, default=16)
    p.add_argument("--strips", default="16,32,64",
                   help="pinned P values to ablate against auto")
    p.add_argument("--tm", default="",
                   help="comma list of strip heights to ablate (e.g. "
                        "8,16,32); empty = the geometry search's pick "
                        "only.  Use to fit panel_strip_us on-chip.")
    p.add_argument("--tk", default="",
                   help="comma list of k-tile widths to ablate (e.g. "
                        "128,256); empty = the geometry search's pick "
                        "only.  Validates the tk term of the cost model.")
    p.add_argument("--budget-bytes", type=int, default=8 * 1024 * 1024)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from tpuspmm.data import data_dir
    from tpuspmm.formats import convert
    from tpuspmm.kernels import panel_spmm
    from tpuspmm.ops import oracle, vendor
    from tpuspmm.utils import timing
    from tpuspmm.utils.compare import allclose

    rc = 0
    for name in args.cases:
        d = data_dir(name)
        if d is None:
            print(json.dumps({"matrix": name, "error": "no data dir"}))
            rc = 1
            continue
        a = convert.load_sparse(d, "csr")
        rng = np.random.default_rng(11)
        b = rng.uniform(-1, 1, (a.shape[1], args.width)).astype(np.float32)
        b_dev = jnp.asarray(b)
        ref = oracle.spmm_scipy_oracle(a, b)

        try:
            vendor.spmm_vendor(a, b_dev)  # warm the lowering cache
            t_vendor = timing.device_time_ms(
                lambda bb: vendor.spmm_vendor(a, bb), b_dev, iters=8)
        except Exception:
            t_vendor = float("nan")

        geoms = [("auto", None, None, None)]
        geoms += [(f"P{s}", int(s), None, None)
                  for s in args.strips.split(",") if s]
        geoms += [(f"tm{t}", None, int(t), None)
                  for t in args.tm.split(",") if t]
        geoms += [(f"tk{t}", None, None, int(t))
                  for t in args.tk.split(",") if t]
        for label, strips, tm_pin, tk_pin in geoms:
            try:
                geom = panel_spmm.resolve_panel_geometry(
                    a, budget_bytes=args.budget_bytes,
                    plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP,
                    panel_strips=strips, tm=tm_pin, tk=tk_pin)
                if geom is None:
                    print(json.dumps({"matrix": name, "geom": label,
                                      "error": "inadmissible"}))
                    continue
                plan = panel_spmm.panel_plan_from_geometry(a, geom)
                for mode in ("highest", "split2"):
                    fn = (lambda md: lambda bb: panel_spmm.spmm_panel(
                        plan, bb, mode=md))(mode)
                    out = np.asarray(fn(b_dev))
                    ok = allclose(out, ref, 1e-2, 1e-3)
                    ms = timing.device_time_ms(fn, b_dev,
                                               iters=args.repeats)
                    n_strips = plan.offs.size
                    print(json.dumps({
                        "matrix": name, "geom": label, "mode": mode,
                        "P": geom.panel_strips, "tm": geom.tm,
                        "tk": geom.tk, "sm": geom.sm,
                        "perm": geom.row_perm is not None,
                        "plan_mb": round(plan.plan_bytes / 1e6, 2),
                        "dtype": str(plan.a_dense.dtype),
                        # model-fit inputs (bench/fit_panel_model.py):
                        "strips": int(n_strips),
                        "steps": int(plan.n_panels),
                        "m": int(a.shape[0]), "n": int(args.width),
                        "strip_bytes": int(plan.tm * plan.tk
                                           * plan.a_dense.dtype.itemsize),
                        "ms": round(ms, 4),
                        "vendor_ms": round(t_vendor, 4),
                        "correct": bool(ok)}), flush=True)
            except Exception as e:  # keep ablating other configs
                print(json.dumps({"matrix": name, "geom": label,
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
