"""Headline benchmark: CSR SpMM on large_25605 (B width 256) on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

value        — flagship-kernel throughput in GFLOP/s (2·nnz·N / t)
vs_baseline  — speedup over the vendor path (jax.experimental.sparse BCOO,
               the cuSPARSE stand-in per SURVEY.md §2.1 N14)

Config comes from BASELINE.json: the large_25605 SuiteSparse matrix
(n4c6-b13, 6300×25605, 88200 nnz), dense operand width 256 (synthesised —
the reference's dense.mtx for this dir is a missing blob,
reference/.MISSING_LARGE_BLOBS).  Diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REF_DATA = "/root/reference/data"


def _median_time(fn, repeats: int, warmup: int = 2):
    import jax

    for _ in range(warmup):
        out = jax.block_until_ready(fn())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return out, float(np.median(times))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default=os.path.join(REF_DATA, "large_25605"))
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--repeats", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpuspmm.formats import convert
    from tpuspmm.formats.tiles import plan_from_container
    from tpuspmm.kernels import tile_spmm
    from tpuspmm.ops import oracle, vendor
    from tpuspmm.utils.compare import allclose

    a = convert.load_sparse(args.data_dir, "csr")
    b = np.asarray(convert.load_dense(args.data_dir, width=args.width).data,
                   dtype=np.float32)
    testcase = os.path.basename(os.path.normpath(args.data_dir))
    print(f"# {testcase}: A {a.shape} nnz={a.nnz}, B {b.shape}, "
          f"backend={jax.default_backend()}", file=sys.stderr)

    # flagship: tile-sparse Pallas kernel, plan prebuilt (steady-state serving)
    plan = plan_from_container(a)
    b_dev = jnp.asarray(b)
    out, t_ours = _median_time(lambda: tile_spmm.spmm_tiles(plan, b_dev),
                               args.repeats)

    ref = oracle.spmm_scipy_oracle(a, b)
    correct = allclose(np.asarray(out), ref, 1e-2, 1e-3)

    # vendor baseline: jax.experimental.sparse BCOO @ dense
    a_bcoo = vendor.to_bcoo(a)
    try:
        _, t_vendor = _median_time(lambda: vendor._bcoo_spmm(a_bcoo, b_dev),
                                   args.repeats)
    except Exception as e:
        print(f"# vendor baseline failed: {e}", file=sys.stderr)
        t_vendor = float("nan")

    n = b.shape[1]
    flops = 2.0 * a.nnz * n
    gflops = flops / t_ours / 1e9
    nnz_per_s = a.nnz / t_ours
    # HBM traffic of the tile kernel: chunk payloads + one B panel per grid
    # step + the output tiles (v5e HBM ~819 GB/s)
    n_tiles = -(-n // 512) if n > 512 else 1
    bytes_moved = (plan.num_chunks * plan.chunk * 12 * n_tiles
                   + plan.num_chunks * plan.tile_k * min(512, ((n + 127) // 128) * 128) * 4 * n_tiles
                   + plan.num_row_tiles * plan.tile_m * n * 4)
    sol_s = bytes_moved / 819e9
    roofline_frac = sol_s / t_ours if t_ours > 0 else 0.0

    print(f"# ours {t_ours*1e3:.3f} ms ({gflops:.2f} GFLOP/s, "
          f"{nnz_per_s/1e9:.3f} Gnnz/s, {roofline_frac*100:.1f}% of HBM SoL) "
          f"| vendor {t_vendor*1e3:.3f} ms | correct={correct}",
          file=sys.stderr)

    record = {
        "metric": f"csr_spmm_gflops_{testcase}_w{n}",
        "value": round(gflops, 3),
        "unit": "GFLOP/s",
        "vs_baseline": round(t_vendor / t_ours, 3) if np.isfinite(t_vendor) else None,
        "kernel_ms": round(t_ours * 1e3, 4),
        "vendor_ms": round(t_vendor * 1e3, 4) if np.isfinite(t_vendor) else None,
        "nnz_per_s": round(nnz_per_s, 1),
        "hbm_roofline_frac": round(roofline_frac, 4),
        "correct": bool(correct),
        "backend": jax.default_backend(),
    }
    print(json.dumps(record))
    return 0 if correct else 1


if __name__ == "__main__":
    sys.exit(main())
