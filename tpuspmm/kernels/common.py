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


def split_bf16(x, terms: int = 3):
    """bf16 multi-term decomposition: x ≈ Σ parts, every part exactly
    representable in bf16.  Each term adds ~8 mantissa bits: 2 terms carry
    ~2^-17 relative fidelity, 3 terms ~2^-26 (beyond f32's own 2^-24
    accumulation rounding).

    This is the engine of the split-precision matmul strategy: a f32 MXU
    matmul at Precision.HIGHEST costs 6 bf16 passes, but when one operand
    is an *exact* bf16 one-hot (iota-compare selection matrices are 0/1,
    so bf16 loses nothing), `Σ onehot @ part` reproduces the f32 product
    in `terms` single-pass matmuls.  3-term splits on both sides of the
    gather/scatter pair give error ~2^-26·Σ|contrib| — at or below what a
    HIGHEST-precision f32 kernel's own summation rounding produces, for
    a third of its MXU passes.  2-term splits halve that again but can
    breach the abs-1e-3 gate (reference/include/utils.hpp:10-11) when
    values are O(100) and outputs cancel — only the *verified* autotune
    path serves them."""
    parts = []
    rem = x
    for i in range(terms):
        p = rem.astype(jnp.bfloat16)
        parts.append(p)
        if i + 1 < terms:
            rem = rem - p.astype(jnp.float32)
    return parts


def onehot_dot_split(onehot_bf16, parts):
    """Σ onehot @ part: one single-pass bf16 MXU matmul per split term,
    f32 accumulate.  The left operand must be exactly representable in
    bf16 (0/1 one-hot); each matmul is then exact selection/accumulation
    of its bf16 operand and the f32 sum restores precision."""
    acc = jnp.dot(onehot_bf16, parts[0], preferred_element_type=jnp.float32)
    for p in parts[1:]:
        acc = acc + jnp.dot(onehot_bf16, p, preferred_element_type=jnp.float32)
    return acc


def pad_b(b, k_pad: int, n_pad: int):
    """Zero-pad the dense operand to tile-aligned shape."""
    b = jnp.asarray(b)
    k, n = b.shape
    if k == k_pad and n == n_pad:
        return b
    return jnp.pad(b, ((0, k_pad - k), (0, n_pad - n)))
