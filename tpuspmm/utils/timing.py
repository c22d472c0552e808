"""Wall-time measurement against a remote-tunneled TPU.

Two pitfalls of naive timing on this backend (axon PJRT tunnel):

1. ``jax.block_until_ready`` can return on *enqueue*, not completion —
   un-consumed results may never execute at all, yielding impossibly fast
   "times" (a 1.1-TFLOP matmul "finishing" in 90 µs).  Only fetching
   result bytes to the host forces real materialization.
2. A forced fetch pays the tunnel round trip (~30 ms here), which dwarfs
   sub-millisecond kernels.

So this module offers two measurements:

- ``time_fn``      — per-call latency including one forced host fetch
  (honest end-to-end latency, RTT included).
- ``device_time_ms`` — amortized pure-device time: chain ``iters``
  dependent applications of the kernel inside ONE jitted program (each
  iteration's input is perturbed by a reduction of the previous output, so
  no iteration can be dead-code-eliminated or reordered), force one fetch
  at the end, subtract the measured empty-chain overhead, divide by iters.
  This is the number comparable to a roofline.

The reference brackets launch+cudaDeviceSynchronize with std::chrono
(e.g. reference/src/spmm/csr/spmm_csr_k2.cu:71-96) — CUDA's sync really
syncs; these helpers are the equivalent discipline for a remote TPU.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import numpy as np


def force(x):
    """Force full materialization of a device array (fetch one element
    after a blocking wait — the wait alone is not sufficient here)."""
    import jax

    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])
    return x


def time_fn(fn: Callable, warmup: int = 1, repeats: int = 5) -> Tuple[float, object]:
    """Median per-call latency in ms (forced fetch per call) and the last
    result."""
    out = None
    for _ in range(max(0, warmup)):
        out = force(fn())
    times = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        out = force(fn())
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times)), out


_rtt_cache: Optional[float] = None


def tunnel_rtt_ms() -> float:
    """Measured dispatch+fetch round-trip for a trivial kernel."""
    global _rtt_cache
    if _rtt_cache is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda a: a + 1.0)
        x = jnp.ones((8, 128), jnp.float32)
        ms, _ = time_fn(lambda: f(x), warmup=2, repeats=5)
        _rtt_cache = ms
    return _rtt_cache


def device_time_ms(fn: Callable, b, iters: int = 16, repeats: int = 3) -> float:
    """Amortized device time per application of ``fn`` (a b→C kernel).

    Chains ``iters`` applications inside one jitted program; iteration
    i+1's operand is ``b + 1e-30·sum(C_i)``, which (a) forces C_i to fully
    materialize before iteration i+1 and (b) cannot be constant-folded.
    """
    import jax
    import jax.numpy as jnp

    b = jnp.asarray(b)

    @jax.jit
    def chained(b0):
        def body(i, carry):
            bc, s = carry
            c = fn(bc)
            # perturbation math stays f32; the carried operand is cast
            # back to b0's dtype so the loop carry is type-stable for
            # non-f32 ingestion (bf16 + f32 otherwise promotes the carry
            # to f32 and fori_loop rejects the mismatched signature)
            ds = jnp.sum(c).astype(jnp.float32) * jnp.float32(1e-30)
            return ((b0 + ds).astype(b0.dtype), s + ds)

        _, s = jax.lax.fori_loop(0, iters, body, (b0, jnp.float32(0.0)))
        return s

    force(chained(b))  # compile + warm
    times = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        force(chained(b))
        times.append((time.perf_counter() - t0) * 1e3)
    # min over chains: the tunnel and chip are shared, so the fastest
    # observation is the closest to the true device cost
    total = float(np.min(times))
    device_ms = total - tunnel_rtt_ms()
    nxt = _next_iters(device_ms, tunnel_rtt_ms(), iters)
    if nxt is not None:
        return device_time_ms(fn, b, iters=nxt, repeats=repeats)
    return max(device_ms, 1e-6) / iters


def _next_iters(device_ms: float, rtt_ms: float,
                iters: int, cap: int = 4096):
    """Chain-lengthening rule of :func:`device_time_ms`: the chain must
    DOMINATE the round trip, not merely register against it — RTT jitter
    on this tunnel is several ms, so a chain shorter than ~1 RTT measures
    the network, not the kernel (seen as a 2.3x spread across
    identical-geometry panel ablations at iters=16, where 16 x 64 µs of
    signal hid under ~60 ms of RTT).  Returns the lengthened iteration
    count sized so the subtracted signal is at least one RTT long, or
    None when the measurement already qualifies (or the cap is hit)."""
    if device_ms >= rtt_ms or iters >= cap:
        return None
    grow = max(2, int(np.ceil(rtt_ms / max(device_ms, 0.5))))
    return min(iters * grow, cap)
