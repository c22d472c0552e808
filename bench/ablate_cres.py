"""Ablation harness for the C-resident split kernel: time stripped-down
variants (gather-only, scatter-only, no-accumulate, ...) to attribute the
gap between measured time and the MXU-pass floor.  Results feed the
kernel-tuning notes in BENCHMARKS.md.

The stripped variants compute WRONG results on purpose — they exist only
to isolate cost components on the real chip.

Usage::

    python -m bench.ablate_cres -d /root/reference/data/large_25605 --width 256
"""

from __future__ import annotations

import argparse
import functools
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    from tpuspmm.data import data_dir as _dd
    p.add_argument("-d", "--data-dir", default=_dd("large_25605"))
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--repeats", type=int, default=32)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpuspmm.formats import convert
    from tpuspmm.formats.tiles import plan_from_container
    from tpuspmm.kernels import cres_spmm
    from tpuspmm.kernels.common import pad_b, round_up, split_bf16, onehot_dot_split
    from tpuspmm.utils.timing import device_time_ms

    a = convert.load_sparse(args.data_dir, "csr")
    rng = np.random.default_rng(0)
    b = rng.standard_normal((a.shape[1], args.width)).astype(np.float32)
    b_dev = jnp.asarray(b)

    plan = plan_from_container(a)
    tm, tk, E = plan.tile_m, plan.tile_k, plan.chunk
    n_pad = round_up(args.width, 128)
    k_pad = plan.num_k_tiles * tk
    m_pad = plan.num_row_tiles * tm
    rt8, kt8, rows, cols, vals, nblocks = cres_spmm._kmajor_blocks(plan)
    print(f"# nblocks={nblocks} chunks={nblocks*8} m_pad={m_pad} n_pad={n_pad}",
          file=sys.stderr)

    def make(body_mode):
        def kernel(rt_ref, kt8_ref, rows_ref, cols_ref, vals_ref, b_ref, out_ref):
            c = pl.program_id(0)

            @pl.when(c == 0)
            def _():
                out_ref[...] = jnp.zeros_like(out_ref)

            b32 = b_ref[...]
            b_hi = b32.astype(jnp.bfloat16)
            b_lo = (b32 - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            e = rows_ref.shape[1]
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (tm, e), 0)
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (e, tk), 1)
            for sub in range(8):
                rows_ = rows_ref[sub, :]
                cols_ = cols_ref[sub, :]
                vals_ = vals_ref[sub, :]
                off = rt_ref[c * 8 + sub] * tm
                if body_mode == "gather_only":
                    k_onehot = (cols_[:, None] == k_iota).astype(jnp.bfloat16)
                    g = onehot_dot_split(k_onehot, [b_hi, b_lo])
                    out_ref[pl.ds(off, tm), :] += g
                    continue
                if body_mode == "gather1_only":
                    k_onehot = (cols_[:, None] == k_iota).astype(jnp.bfloat16)
                    g = jnp.dot(k_onehot, b_hi, preferred_element_type=jnp.float32)
                    out_ref[pl.ds(off, tm), :] += g
                    continue
                if body_mode == "scatter_only":
                    v = b32[0:e, :] * vals_[:, None]
                    v_hi, v_lo = split_bf16(v, 2)
                    r_onehot = (rows_[None, :] == r_iota).astype(jnp.bfloat16)
                    contrib = onehot_dot_split(r_onehot, [v_hi, v_lo])
                    out_ref[pl.ds(off, tm), :] += contrib
                    continue
                if body_mode == "accum_only":
                    out_ref[pl.ds(off, tm), :] += b32[0:tm, :]
                    continue
                # full split path
                k_onehot = (cols_[:, None] == k_iota).astype(jnp.bfloat16)
                g = onehot_dot_split(k_onehot, [b_hi, b_lo])
                v = g * vals_[:, None]
                if body_mode == "full_nosplitv":
                    v_hi = v.astype(jnp.bfloat16)
                    v_lo = v_hi
                else:
                    v_hi, v_lo = split_bf16(v, 2)
                r_onehot = (rows_[None, :] == r_iota).astype(jnp.bfloat16)
                contrib = onehot_dot_split(r_onehot, [v_hi, v_lo])
                out_ref[pl.ds(off, tm), :] += contrib

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((8, E), lambda c, rt_ref, kt_ref: (c, 0)),
                pl.BlockSpec((8, E), lambda c, rt_ref, kt_ref: (c, 0)),
                pl.BlockSpec((8, E), lambda c, rt_ref, kt_ref: (c, 0)),
                pl.BlockSpec((tk, n_pad), lambda c, rt_ref, kt_ref: (kt_ref[c], 0)),
            ],
            out_specs=pl.BlockSpec((m_pad, n_pad), lambda c, rt_ref, kt_ref: (0, 0)),
        )

        @jax.jit
        def run(bp):
            return pl.pallas_call(
                kernel, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
            )(rt8, kt8, rows, cols, vals, bp)

        return run

    b_padded = pad_b(b_dev, k_pad, n_pad)
    for mode in ("full", "full_nosplitv", "gather_only", "gather1_only",
                 "scatter_only", "accum_only"):
        run = make(mode)
        try:
            run(b_padded)
            ms = device_time_ms(run, b_padded, iters=args.repeats)
            print(f"{mode:16s}: {ms:.4f} ms")
        except Exception as e:
            print(f"{mode:16s}: ERROR {type(e).__name__}: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
