"""Measured HBM controls: what fraction of nominal bandwidth this chip
actually delivers to well-formed XLA programs.

The BASELINE.md flagship target is quoted against *absolute* HBM
speed-of-light (nominal 819 GB/s on v5e).  Whether 80% of that is
reachable for ANY kernel on this machine is an empirical question —
these controls answer it with the same chained device timer the SpMM
benches use (VERDICT r3 #6: "if 80% of absolute SoL is provably
unreachable ... say so with a measured control (a dense matmul moving
the same bytes) and re-base the target with that evidence").

Controls (one JSON line each):

- ``stream``      — fused elementwise y = 2x + 1 over a large f32 array
  (read + write, zero compute): the practical ceiling for pure HBM
  streaming through XLA.
- ``matmul_sol``  — dense bf16 A (sized to the headline panel plan's
  26.35 MB) @ f32 B, f32 C out: the same bytes the panel kernel moves,
  through XLA's own MXU matmul.  If even this cannot hit 80% of
  nominal, no gather-free SpMM formulation can.
- ``matmul_pair`` — same, with A sized to the PAIR plan's unpadded
  14.15 MB stream: the floor the fill lever (VERDICT r3 #6) is chasing.

Usage::

    python -m bench.hbm_control [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

# headline geometry (large_25605 @ width 256, BENCH_r04 provenance):
# m_pad 6304, n_pad 256, panel plan 26.35 MB bf16, pair plan 14.15 MB
M_PAD = 6304
N_PAD = 256
PANEL_PLAN_BYTES = 26_350_000
PAIR_PLAN_BYTES = 14_150_000


def _control_matmul(plan_bytes: int):
    """Dense bf16 A sized to ``plan_bytes``, B/C mirroring the headline
    SpMM operands: C[m_pad, n_pad] f32 = A[m_pad, kd] bf16 @ B[kd, n_pad].
    kd is A's column count such that m_pad*kd*2 = plan_bytes, rounded to
    a lane multiple."""
    import jax
    import jax.numpy as jnp

    kd = max(128, int(round(plan_bytes / (M_PAD * 2) / 128)) * 128)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M_PAD, kd)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((kd, N_PAD)), jnp.float32)

    def fn(bb):
        return jnp.dot(a, bb.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    bytes_moved = (a.size * 2 + b.size * 4 + M_PAD * N_PAD * 4)
    flops = 2.0 * M_PAD * kd * N_PAD
    return fn, b, bytes_moved, flops, {"m": M_PAD, "kd": kd, "n": N_PAD}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--stream-mb", type=int, default=64)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpuspmm.engine.report import HBM_GBPS, detect_chip
    from tpuspmm.utils import timing

    chip = detect_chip()
    nominal = HBM_GBPS.get(chip, 819e9)
    records = []

    # ---- stream: fused elementwise read+write --------------------------
    n_el = args.stream_mb * 1024 * 1024 // 4
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n_el),
                    jnp.float32)
    stream_fn = lambda xx: 2.0 * xx + 1.0
    ms = timing.device_time_ms(stream_fn, x, iters=8)
    bytes_moved = 2 * n_el * 4
    records.append({
        "control": "stream", "chip": chip,
        "bytes_mb": round(bytes_moved / 1e6, 1),
        "ms": round(ms, 4),
        "gbps": round(bytes_moved / (ms / 1e3) / 1e9, 1),
        "frac_of_nominal": round(bytes_moved / (ms / 1e3) / nominal, 4),
    })

    # ---- matmuls moving the headline byte mixes ------------------------
    for name, plan_bytes in (("matmul_sol", PANEL_PLAN_BYTES),
                             ("matmul_pair", PAIR_PLAN_BYTES)):
        fn, b, bytes_moved, flops, shape = _control_matmul(plan_bytes)
        ms = timing.device_time_ms(fn, b, iters=16)
        secs = ms / 1e3
        records.append({
            "control": name, "chip": chip, **shape,
            "bytes_mb": round(bytes_moved / 1e6, 1),
            "ms": round(ms, 4),
            "gbps": round(bytes_moved / secs / 1e9, 1),
            "frac_of_nominal": round(bytes_moved / secs / nominal, 4),
            "gflops": round(flops / secs / 1e9, 1),
        })

    for rec in records:
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
