"""Steady-state kernel profiler: device-resident inputs, per-strategy times.

Unlike the engine sweeps (which mirror the reference's prolog/kernel/epilog
decomposition), this tool isolates pure device compute for kernel tuning:
all operands are transferred once, then each strategy is timed over many
repeats.  Used to pick tile geometry and dispatch thresholds per matrix
class.

Usage::

    python -m bench.profile_variants -d /root/reference/data/large_25605 \
        --width 256 [--repeats 30] [--tile-ks 128,256,512] [--chunks 128]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("-d", "--data-dir", default=None)
    p.add_argument("--random", default=None, metavar="ROWSxCOLSxDENSITY",
                   help="synthetic CSR instead of a data dir, e.g. 2048x2048x0.1")
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--repeats", type=int, default=30)
    p.add_argument("--tile-ks", default="128,256,512")
    p.add_argument("--chunks", default="128")
    p.add_argument("--skip", default="", help="comma list: xla,tile,densify,vendor")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpuspmm.formats import convert
    from tpuspmm.formats.tiles import plan_from_container
    from tpuspmm.kernels import tile_spmm
    from tpuspmm.ops import oracle, vendor, xla
    from tpuspmm.utils.compare import allclose
    from tpuspmm.utils.timing import device_time_ms, tunnel_rtt_ms

    skip = set(args.skip.split(",")) if args.skip else set()
    if args.random:
        from tpuspmm.formats import CSR

        r, c, d = args.random.split("x")
        a = CSR.random(int(r), int(c), float(d), seed=0)
        b = (np.random.default_rng(1)
             .uniform(-1, 1, (int(c), args.width)).astype(np.float32))
        args.data_dir = f"random_{args.random}"
    else:
        a = convert.load_sparse(args.data_dir, "csr")
        b = np.asarray(convert.load_dense(args.data_dir, width=args.width).data,
                       dtype=np.float32)
    b_dev = jnp.asarray(b)
    ref = oracle.spmm_scipy_oracle(a, b)
    n = b.shape[1]
    flops = 2.0 * a.nnz * n
    print(f"# A {a.shape} nnz={a.nnz} (density {a.sparsity:.2e}), N={n}, "
          f"backend={jax.default_backend()}", file=sys.stderr)

    print(f"# tunnel RTT {tunnel_rtt_ms():.1f} ms (amortized out below)",
          file=sys.stderr)
    rows = []

    def bench(name, fn_of_b):
        """fn_of_b: b -> C, timed as a chained device loop (RTT excluded)."""
        try:
            out = fn_of_b(b_dev)
            ok = allclose(np.asarray(out), ref, 1e-2, 1e-3)
            ms = device_time_ms(fn_of_b, b_dev, iters=args.repeats)
        except Exception as e:
            print(f"# {name}: ERROR {type(e).__name__}: {e}", file=sys.stderr)
            return
        gflops = flops / (ms / 1e3) / 1e9
        rows.append({"variant": name, "ms": round(ms, 4),
                     "gflops": round(gflops, 2), "correct": bool(ok)})
        print(f"# {name:28s} {ms:9.3f} ms  {gflops:9.2f} GFLOP/s  correct={ok}",
              file=sys.stderr)

    if "xla" not in skip:
        bench("xla_segment_sum", lambda bb: xla.spmm_csr_xla(a, bb))
    if "tile" not in skip:
        for tk in (int(x) for x in args.tile_ks.split(",")):
            for ch in (int(x) for x in args.chunks.split(",")):
                plan = plan_from_container(a, tile_m=128, tile_k=tk, chunk=ch)
                print(f"#   plan tk={tk} chunk={ch}: {plan.num_chunks} chunks "
                      f"({plan.num_chunks * ch / max(a.nnz, 1):.1f}x padding)",
                      file=sys.stderr)
                bench(f"pallas_tile_tk{tk}_c{ch}",
                      lambda bb, plan=plan: tile_spmm.spmm_tiles(plan, bb))
    if "cres" not in skip:
        from tpuspmm.kernels import cres_spmm

        plan = plan_from_container(a)
        m_pad = plan.num_row_tiles * plan.tile_m
        if cres_spmm.fits_vmem_out(m_pad, ((n + 127) // 128) * 128, plan.tile_k):
            bench("pallas_c_resident",
                  lambda bb: cres_spmm.spmm_cres(plan, bb))
    if "staged" not in skip:
        from tpuspmm.kernels import csr_vmem

        plan = plan_from_container(a)
        n_pad = ((n + 127) // 128) * 128
        k_pad = plan.num_k_tiles * plan.tile_k
        chunk_bytes = plan.num_chunks * plan.chunk * 12
        if csr_vmem.fits_vmem(k_pad, n_pad, plan.tile_m, chunk_bytes=chunk_bytes,
                              tile_k=plan.tile_k):
            bench("pallas_staged_b",
                  lambda bb: csr_vmem.spmm_staged(plan, bb))
    if "densify" not in skip and a.shape[0] * a.shape[1] * 4 <= (1 << 29):
        # cached-densify serve path (round 5): densify once, one dense
        # MXU matmul per call — same strategy the registry variant
        # serves.  The cache build accumulates in host f64 (2x the f32
        # dense bytes), so the guard admits half the old 1 GiB cap.
        bench("xla_densify_matmul",
              lambda bb: xla.spmm_densify_cached(a, bb))
    if "vendor" not in skip:
        a_bcoo = vendor.to_bcoo(a)
        bench("vendor_bcoo", lambda bb: vendor._bcoo_spmm(a_bcoo, bb))

    print(json.dumps({"testcase": args.data_dir, "width": n, "results": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
