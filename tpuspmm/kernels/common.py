"""Shared kernel utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def should_interpret(interpret=None) -> bool:
    """Pallas kernels run compiled on TPU backends, interpreted elsewhere
    (tests run on the CPU backend; SURVEY.md §7 'No TPU in the loop early')."""
    if interpret is not None:
        return bool(interpret)
    return jax.default_backend() not in ("tpu", "axon")


def pad_b(b, k_pad: int, n_pad: int):
    """Zero-pad the dense operand to tile-aligned shape."""
    b = jnp.asarray(b)
    k, n = b.shape
    if k == k_pad and n == n_pad:
        return b
    return jnp.pad(b, ((0, k_pad - k), (0, n_pad - n)))
