"""Wedge-proof TPU availability gate.

The axon tunnel to the single real TPU chip on this machine can wedge for
hours (killing a client mid-compile leaves every subsequent device op
hanging; see CLAUDE.md and .claude/skills/verify/SKILL.md).  Round 2's
driver-captured benchmark failed with rc=1 purely because the backend was
unreachable at capture time, so the measurement harness now *gates* on a
bounded probe-wait loop before touching the backend in-process.

Pattern (matches the reference's always-emitted record stream — the
harness must produce a record per run, not die on an infra hiccup;
reference/src/engine/engine.cpp:36-55):

  1. Probe the tunnel from a THROWAWAY SUBPROCESS (a trivial 128x128
     matmul with a forced host fetch) under a hard timeout.  The parent
     process never initialises a backend until a probe has succeeded, so
     a wedged tunnel cannot poison the measurement process itself.
  2. On failure, sleep and retry until a wall-clock budget is exhausted.
  3. Report True (TPU usable) / False (fall back to CPU, degraded mode).

Usable as a library (``await_tpu()``) or a CLI::

    python -m bench.await_tpu --budget 1800   # rc 0 = TPU up, 1 = gave up
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

# A probe is a trivial matmul + forced fetch: compile is near-instant, so
# timing one out and killing it does not risk the mid-compile wedge the
# way killing a real kernel build does.
_PROBE_SRC = """
import numpy as np
import jax.numpy as jnp
x = jnp.ones((128, 128), jnp.float32)
v = float(np.asarray(x @ x)[0, 0])
assert v == 128.0, v
print("tunnel-ok", v)
"""


def probe_once(timeout_s: float = 90.0) -> bool:
    """One subprocess probe of the default jax backend.  True iff a tiny
    matmul compiled, ran, and round-tripped to host within ``timeout_s``."""
    env = dict(os.environ)
    # The probe must see the same backend the measurement will use — do
    # not override JAX_PLATFORMS here.
    try:
        res = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout_s,
            capture_output=True,
            env=env,
        )
    except subprocess.TimeoutExpired:
        return False
    except OSError:
        return False
    return res.returncode == 0 and b"tunnel-ok" in res.stdout


def await_tpu(
    budget_s: float = 1800.0,
    probe_timeout_s: float = 90.0,
    sleep_s: float = 120.0,
    log=None,
) -> bool:
    """Block until a backend probe succeeds or ``budget_s`` elapses.

    Returns True when the device path is usable.  The first probe runs
    immediately; on a healthy tunnel this returns in a few seconds.
    """
    if log is None:
        log = lambda msg: print(msg, file=sys.stderr, flush=True)
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.monotonic()
        if probe_once(probe_timeout_s):
            log(f"# await_tpu: probe ok (attempt {attempt}, "
                f"{time.monotonic() - t0:.1f}s)")
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            log(f"# await_tpu: budget exhausted after {attempt} probes — "
                f"backend unusable")
            return False
        nap = min(sleep_s, max(remaining, 1.0))
        log(f"# await_tpu: probe {attempt} failed; retrying in {nap:.0f}s "
            f"({remaining:.0f}s of budget left)")
        time.sleep(nap)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--budget", type=float, default=1800.0,
                   help="total seconds to keep retrying (default 1800)")
    p.add_argument("--probe-timeout", type=float, default=90.0)
    p.add_argument("--sleep", type=float, default=120.0)
    args = p.parse_args(argv)
    ok = await_tpu(args.budget, args.probe_timeout, args.sleep)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
