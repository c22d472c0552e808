"""End-to-end example: a pruned transformer MLP block served with tpuspmm.

The reference frames SpMM as the pruned-LLM inference primitive
(reference/README.md:11-24); this example is that use end to end: a
2-layer MLP whose weight matrices are 90% block-sparse (4×4 pruning
granularity), applied to a batch of activations

    h = gelu(x @ W1ᵀ);  y = h @ W2ᵀ

Each `x @ Wᵀ` is `(W @ xᵀ)ᵀ` — a sparse-times-dense SpMM — so the layer
runs through `tpuspmm.spmm` with the tuned/auto dispatch.  Run it:

    python examples/pruned_mlp.py                # single chip (or CPU)
    python examples/pruned_mlp.py --sharded      # 2-D mesh via tpuspmm.parallel

The sharded path row-shards each weight across the mesh "rows" axis and
column-shards the activation batch over "cols" — the same layout the
distributed test suite exercises on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import argparse
import os
import sys

# allow running as a plain script from anywhere: put the repo root on
# sys.path when tpuspmm is not installed
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def build_layer(d_out: int, d_in: int, block_sparsity: float, seed: int):
    from tpuspmm.formats import BSR

    return BSR.random_blocks(d_out, d_in, block_size=(4, 4),
                             block_density=1.0 - block_sparsity, seed=seed)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--d-model", type=int, default=1024)
    p.add_argument("--d-ff", type=int, default=4096)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--block-sparsity", type=float, default=0.9)
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--method", default="auto",
                   choices=["auto", "xla", "pallas", "tuned", "vendor"])
    p.add_argument("--activations-dtype", default="f32",
                   choices=["f32", "bf16"],
                   help="bf16 = how activations actually arrive in LLM "
                        "serving; kernels ingest them directly (one exact "
                        "MXU pass), outputs stay f32")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import tpuspmm

    rng = np.random.default_rng(0)
    w1 = build_layer(args.d_ff, args.d_model, args.block_sparsity, seed=1)
    w2 = build_layer(args.d_model, args.d_ff, args.block_sparsity, seed=2)
    x = rng.standard_normal((args.batch, args.d_model)).astype(np.float32) * 0.1
    if args.activations_dtype == "bf16":
        import ml_dtypes

        x = x.astype(ml_dtypes.bfloat16)
    print(f"# W1 {w1.shape} ({w1.nnz} nnz), W2 {w2.shape}, "
          f"x {x.shape}, backend={jax.default_backend()}", file=sys.stderr)

    if args.sharded:
        from tpuspmm.parallel import make_mesh, spmm_row_sharded

        n_dev = len(jax.devices())
        mesh = make_mesh((n_dev,), ("rows",))

        def mlp(xb):
            h = spmm_row_sharded(w1, np.asarray(xb).T, mesh, local="xla").T
            h = jax.nn.gelu(jnp.asarray(h)).astype(xb.dtype)  # serving dtype
            y = spmm_row_sharded(w2, np.asarray(h).T, mesh, local="xla").T
            return y
    else:
        def mlp(xb):
            h = tpuspmm.spmm(w1, jnp.asarray(xb).T, method=args.method).T
            h = jax.nn.gelu(h).astype(xb.dtype)  # keep the serving dtype
            y = tpuspmm.spmm(w2, h.T, method=args.method).T
            return y

    t0 = time.perf_counter()
    y = np.asarray(mlp(x))
    t1 = time.perf_counter()
    # correctness against the dense reference
    # the reference follows the SERVED pipeline's dtypes (the oracle of
    # the values actually computed): bf16 serving re-quantizes h between
    # layers, so the dense reference must too
    ref_h = np.asarray(jax.nn.gelu(jnp.asarray(
        x.astype(np.float32) @ w1.to_dense().T)))
    ref_h = ref_h.astype(x.dtype).astype(np.float32)
    ref_y = ref_h @ w2.to_dense().T
    from tpuspmm.utils.compare import allclose

    ok = allclose(y, ref_y, 1e-2, 1e-3)
    print(f"# first call (incl. compile): {t1 - t0:.2f}s, output {y.shape}, "
          f"matches dense reference: {ok}", file=sys.stderr)
    print({"correct": bool(ok), "out_shape": list(y.shape),
           "sharded": args.sharded, "method": args.method,
           "activations_dtype": args.activations_dtype})
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
