"""Pair-vs-panel ablation: time the run-length pair kernel against the
padded panel kernel on the same matrices, both precision modes, with
chained device timing.  The pair plan stores 15-46% fewer bytes on the
corpus (zero per-pair padding) — this harness measures whether that
bandwidth saving survives the in-kernel DMA loop's overheads.

Prints one JSON line per (matrix, kernel, mode); ``correct`` reflects
the rel 1e-2 / abs 1e-3 gate (reference/include/utils.hpp:10-11).

Usage::

    python -m bench.ablate_pair [large_25605 large_21074 ...]
        [--width 256] [--repeats 16]
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
    p.add_argument("--budget-bytes", type=int, default=8 * 1024 * 1024)
    p.add_argument("--chunks", default="",
                   help="comma-separated pinned CH values to ablate in "
                        "addition to the auto pick (e.g. 8,16,32,64)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from tpuspmm.data import data_dir
    from tpuspmm.formats import convert
    from tpuspmm.kernels import pair_spmm, panel_spmm
    from tpuspmm.kernels.common import round_up
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
        n_pad = round_up(args.width, 128)

        try:
            vendor.spmm_vendor(a, b_dev)  # warm the lowering cache
            t_vendor = timing.device_time_ms(
                lambda bb: vendor.spmm_vendor(a, bb), b_dev, iters=8)
        except Exception:
            t_vendor = float("nan")

        plans = []
        try:
            pg = panel_spmm.resolve_panel_geometry(
                a, n_pad, budget_bytes=args.budget_bytes,
                plan_bytes_cap=panel_spmm.PLAN_BYTES_CAP)
            if pg is not None:
                pp = panel_spmm.panel_plan_from_geometry(a, pg)
                plans.append(("panel", pp,
                              lambda md, pl=pp: lambda bb:
                              panel_spmm.spmm_panel(pl, bb, mode=md),
                              {"P": pg.panel_strips, "sm": pg.sm,
                               "perm": pg.row_perm is not None,
                               "steps": int(pp.kt.shape[0])}))
        except Exception as e:
            print(json.dumps({"matrix": name, "kernel": "panel",
                              "error": f"{type(e).__name__}: {e}"}))
        chs = [None] + [int(c) for c in args.chunks.split(",") if c]
        for ch in chs:
            label = "pair" if ch is None else f"pair_ch{ch}"
            try:
                qg = pair_spmm.resolve_pair_geometry(
                    a, n_pad, budget_bytes=args.budget_bytes,
                    plan_bytes_cap=pair_spmm.PLAN_BYTES_CAP,
                    chunk_strips=ch)
                if qg is None:
                    continue
                m_pad = round_up(int(a.shape[0]), 8)
                qp = pair_spmm.pair_plan_from_container(
                    a, chunk_strips=qg.chunk_strips,
                    sm=None if qg.sm == m_pad else qg.sm, n_pad=n_pad,
                    geom=qg)
                plans.append((label, qp,
                              lambda md, pl=qp: lambda bb:
                              pair_spmm.spmm_pair(pl, bb, mode=md),
                              {"CH": qp.chunk_strips, "sm": qg.sm,
                               "perm": qg.row_perm is not None,
                               "steps": int(qp.chunk_arrays()[0].shape[0])}))
            except Exception as e:
                print(json.dumps({"matrix": name, "kernel": label,
                                  "error": f"{type(e).__name__}: {e}"}))

        for kernel, plan, mk, extra in plans:
            for mode in ("highest", "split2"):
                try:
                    fn = mk(mode)
                    out = np.asarray(fn(b_dev))
                    ok = allclose(out, ref, 1e-2, 1e-3)
                    ms = timing.device_time_ms(fn, b_dev,
                                               iters=args.repeats)
                    print(json.dumps({
                        "matrix": name, "kernel": kernel, "mode": mode,
                        "plan_mb": round(plan.plan_bytes / 1e6, 2),
                        "dtype": str(plan.a_dense.dtype),
                        "ms": round(ms, 4),
                        "vendor_ms": round(t_vendor, 4),
                        "correct": bool(ok), **extra}), flush=True)
                except Exception as e:  # keep ablating other configs
                    print(json.dumps({"matrix": name, "kernel": kernel,
                                      "mode": mode,
                                      "error": f"{type(e).__name__}: {e}"}),
                          flush=True)
                    rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
