"""Wall-time brackets around device computations.

The reference brackets each phase with std::chrono around
launch+cudaDeviceSynchronize (e.g. reference/src/spmm/csr/spmm_csr_k2.cu:71-96);
the JAX analogue is perf_counter around `jax.block_until_ready`.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import numpy as np


def time_fn(fn: Callable, warmup: int = 1, repeats: int = 5) -> Tuple[float, object]:
    """Median steady-state milliseconds and the last result."""
    import jax

    out = None
    for _ in range(max(0, warmup)):
        out = jax.block_until_ready(fn())
    times = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)), out
