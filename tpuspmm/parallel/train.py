"""Distributed least-squares training step — the framework's "full training
step" demonstrator.

Problem: given a sparse operator A (M×K) and a target C (M×N), learn the
dense operand B minimizing 0.5·‖A@B − C‖².  This is the training-shaped
use of SpMM (pruned-LLM layers: frozen sparse weights, dense activations
being optimized / gradients flowing through the sparse matmul).

Mesh mapping (2-D mesh from tpuspmm.parallel.mesh):

- ``"rows"`` shards A's rows and C's rows  (data-parallel analogue);
- ``"cols"`` shards B's and C's columns    (tensor-parallel analogue);
- B is replicated over ``"rows"``; its gradient is a contraction over the
  row-sharded M dimension, so dB takes a ``psum`` over ``"rows"`` — the
  canonical gradient collective.

Forward and backward both run through ``spmm_triplets`` (gather +
segment-sum); the backward is the transpose-triplet SpMM
(d/dB of A@B is Aᵀ@dC — tpuspmm/ops/api.py spmm_transpose).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuspmm.kernels.common import round_up
from tpuspmm.ops.xla import spmm_triplets
from tpuspmm.parallel.shard import bucket_triplets


def make_train_state(a, n: int, mesh: Mesh, seed: int = 0) -> Dict:
    """Shard A/B/C onto the mesh and return the training state.

    B is initialised randomly; the target C is a random dense matrix (in a
    real pruned-LLM setting it would be activations/labels).
    """
    n_rows = mesh.shape["rows"]
    n_cols = mesh.shape["cols"]
    buckets = bucket_triplets(a, n_rows, 1)  # cols stay global K ids
    m, k = buckets.shape
    m_local = buckets.m_local
    k_pad = buckets.k_local  # single k shard → padded K
    n_pad = round_up(-(-n // n_cols), 128) * n_cols

    rng = np.random.default_rng(seed)
    b0 = rng.standard_normal((k_pad, n_pad)).astype(np.float32) * 0.02
    c_target = rng.standard_normal((m_local * n_rows, n_pad)).astype(np.float32)

    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    return {
        "rows": put(buckets.rows[:, 0], P("rows")),   # (R, E)
        "cols": put(buckets.cols[:, 0], P("rows")),
        "vals": put(buckets.vals[:, 0], P("rows")),
        "b": put(b0, P(None, "cols")),
        "c_target": put(c_target, P("rows", "cols")),
        "meta": {"m": m, "k": k, "m_local": m_local, "k_pad": k_pad,
                 "n": n, "n_pad": n_pad},
    }


@functools.lru_cache(maxsize=64)
def _train_step_callable(mesh: Mesh, m_local: int, k_pad: int):
    """Jitted shard_map step, cached per (mesh, geometry) — building it
    inside lsq_train_step would retrace+recompile every step.  ``lr`` is a
    traced argument so sweeping it costs no recompile."""

    def local_step(rows, cols, vals, b, c_tgt, lr):
        rows, cols, vals = rows[0], cols[0], vals[0]  # (E,)
        # forward: local C slab
        c_hat = spmm_triplets(rows, cols, vals, b, num_rows=m_local)
        res = c_hat - c_tgt
        loss = 0.5 * jnp.sum(res * res)
        loss = jax.lax.psum(jax.lax.psum(loss, "rows"), "cols")
        # backward: dB = Aᵀ @ res, contraction over row-sharded M → psum
        db = spmm_triplets(jnp.where(rows < 0, -1, cols), rows, vals, res,
                           num_rows=k_pad)
        db = jax.lax.psum(db, "rows")
        return b - lr * db, loss

    return jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("rows"), P("rows"), P("rows"), P(None, "cols"),
                  P("rows", "cols"), P()),
        out_specs=(P(None, "cols"), P()),
    ))


def lsq_train_step(state: Dict, mesh: Mesh, lr: float = 1e-2):
    """One jitted, fully-sharded SGD step.  Returns (new_state, loss)."""
    meta = state["meta"]
    fn = _train_step_callable(mesh, meta["m_local"], meta["k_pad"])
    new_b, loss = fn(state["rows"], state["cols"], state["vals"],
                     state["b"], state["c_target"], jnp.float32(lr))
    new_state = dict(state)
    new_state["b"] = new_b
    return new_state, loss
