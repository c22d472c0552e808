"""Distributed-layer tests on the 8-virtual-CPU-device mesh (conftest).

The reference has nothing distributed to mirror (SURVEY.md §0); these gate
the new-build capability: every schedule must match the numpy oracle at the
reference tolerance (rel 1e-2 / abs 1e-3, reference/include/utils.hpp:10-11).
"""

import numpy as np
import pytest

import jax

from tpuspmm.formats import CSR
from tpuspmm.ops import oracle
from tpuspmm.parallel import (
    make_mesh,
    spmm_row_sharded,
    spmm_ring,
    spmm_2d,
    lsq_train_step,
    make_train_state,
)
from tpuspmm.utils.compare import allclose


@pytest.fixture(scope="module")
def problem(rng=None):
    rng = np.random.default_rng(7)
    a = CSR.random(300, 420, 0.05, seed=3)
    b = rng.standard_normal((420, 96)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    return a, b, ref


def test_row_sharded_tile(problem):
    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_row_sharded(a, b, mesh, local="tile"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_row_sharded_panel(problem):
    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_row_sharded(a, b, mesh, local="panel"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_row_sharded_panel_supertiled(problem):
    # force a per-shard supertile split: sm < m_local
    a, b, ref = problem
    from tpuspmm.parallel.shard import shard_rows_panelplan

    plan = shard_rows_panelplan(a, 4, sm=16)
    assert plan.n_supertiles > 1
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_row_sharded(a, b, mesh, local="panel", plan=plan))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_row_sharded_panel_bf16_plan(problem):
    # ±1 values → per-shard plans compact to bf16 losslessly; the stacked
    # plan must shard and serve through shard_map unchanged
    import ml_dtypes

    from tpuspmm.formats import COO
    from tpuspmm.parallel.shard import shard_rows_panelplan

    rng = np.random.default_rng(21)
    m, k, per_row = 300, 420, 5
    rows = np.repeat(np.arange(m, dtype=np.int32), per_row)
    cols = rng.integers(0, k, m * per_row).astype(np.int32)
    vals = rng.choice([-1.0, 1.0], m * per_row).astype(np.float32)
    a = COO(shape=(m, k), rows=rows, cols=cols, values=vals)
    b = rng.standard_normal((k, 96)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    plan = shard_rows_panelplan(a, 8)
    assert plan.a_dense.dtype == ml_dtypes.bfloat16
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_row_sharded(a, b, mesh, local="panel", plan=plan))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_row_sharded_pair(problem):
    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_row_sharded(a, b, mesh, local="pair"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_row_sharded_pair_supertiled_uneven_shards(problem):
    # sm < m_local forces per-shard supertiling; 3 shards over 300 rows
    # makes the last slab ragged, so per-shard pair/strip counts differ
    # and the uniform-padding path is exercised
    a, b, ref = problem
    from tpuspmm.parallel.shard import shard_rows_pairplan

    plan = shard_rows_pairplan(a, 3, sm=48, chunk_strips=8)
    assert plan.n_supertiles > 1
    mesh = make_mesh((3,), ("rows",))
    out = np.asarray(spmm_row_sharded(a, b, mesh, local="pair", plan=plan))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_row_sharded_xla(problem):
    a, b, ref = problem
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_row_sharded(a, b, mesh, local="xla"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring(problem):
    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_ring(a, b, mesh))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_uneven_shapes():
    # M, K deliberately not multiples of shard counts
    rng = np.random.default_rng(11)
    a = CSR.random(97, 205, 0.08, seed=5)
    b = rng.standard_normal((205, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_ring(a, b, mesh))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_tile_local(problem):
    """VERDICT r2 #4: the ring schedule's device-local compute must be
    servable by the Pallas tile kernel (per-bucket tile plans selected by
    dynamic ring index), not only the XLA segment-sum."""
    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_ring(a, b, mesh, local="tile"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_tile_local_uneven_buckets():
    """Uneven-bucket correctness (VERDICT r2 #4 done-criterion): ragged
    M/K, a nearly-empty bucket (all nnz concentrated in low K), and a
    ragged last row shard."""
    rng = np.random.default_rng(13)
    m, k = 97, 205
    # concentrate 90% of nnz in K < 64 so buckets differ wildly in size
    n1, n2 = 360, 40
    rows = np.concatenate([rng.integers(0, m, n1), rng.integers(0, m, n2)])
    cols = np.concatenate([rng.integers(0, 64, n1), rng.integers(64, k, n2)])
    vals = rng.standard_normal(n1 + n2).astype(np.float32)
    from tpuspmm.formats import COO

    a = COO(shape=(m, k), rows=rows.astype(np.int32),
            cols=cols.astype(np.int32), values=vals)
    b = rng.standard_normal((k, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_ring(a, b, mesh, local="tile"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_tile_local_cols_axis(problem):
    a, b, ref = problem
    mesh = make_mesh((4, 2), ("rows", "cols"))
    out = np.asarray(spmm_ring(a, b, mesh, cols_axis="cols", local="tile"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_pair_local(problem):
    """VERDICT r3 #7: the flagship pair kernel as the ring schedule's
    local compute — per-(shard, bucket) strip runs jnp.taken by ring
    step, ppermute overlapped."""
    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_ring(a, b, mesh, local="pair"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_pair_local_uneven_buckets():
    """VERDICT r3 #7 done-criterion: pair-local ring on ragged M/K with
    wildly uneven bucket occupancy (90% of nnz in low K — some buckets
    nearly empty, so the uniform chunk/strip padding machinery and the
    count=0 filler DMAs are all exercised)."""
    rng = np.random.default_rng(13)
    m, k = 97, 205
    n1, n2 = 360, 40
    rows = np.concatenate([rng.integers(0, m, n1), rng.integers(0, m, n2)])
    cols = np.concatenate([rng.integers(0, 64, n1), rng.integers(64, k, n2)])
    vals = rng.standard_normal(n1 + n2).astype(np.float32)
    from tpuspmm.formats import COO

    a = COO(shape=(m, k), rows=rows.astype(np.int32),
            cols=cols.astype(np.int32), values=vals)
    b = rng.standard_normal((k, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_ring(a, b, mesh, local="pair"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_pair_local_cols_axis(problem):
    a, b, ref = problem
    mesh = make_mesh((4, 2), ("rows", "cols"))
    out = np.asarray(spmm_ring(a, b, mesh, cols_axis="cols", local="pair"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_kshard_pair_local(problem):
    from tpuspmm.parallel import spmm_kshard

    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_kshard(a, b, mesh, local="pair"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_kshard_pair_local_uneven():
    from tpuspmm.parallel import spmm_kshard

    rng = np.random.default_rng(17)
    a = CSR.random(130, 333, 0.07, seed=9)
    b = rng.standard_normal((333, 72)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_kshard(a, b, mesh, local="pair"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_panel_local(problem):
    """VERDICT r4 #4: the flagship panel kernel as the ring schedule's
    local compute — per-(shard, bucket) plan-time-densified panels
    jnp.taken by ring step, ppermute overlapped."""
    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_ring(a, b, mesh, local="panel"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_panel_local_uneven_buckets():
    """Panel-local ring on ragged M/K with wildly uneven bucket
    occupancy (90% of nnz in low K — some buckets nearly empty, so the
    uniform panel-count padding and the trash-panel convention are all
    exercised)."""
    rng = np.random.default_rng(13)
    m, k = 97, 205
    n1, n2 = 360, 40
    rows = np.concatenate([rng.integers(0, m, n1), rng.integers(0, m, n2)])
    cols = np.concatenate([rng.integers(0, 64, n1), rng.integers(64, k, n2)])
    vals = rng.standard_normal(n1 + n2).astype(np.float32)
    from tpuspmm.formats import COO

    a = COO(shape=(m, k), rows=rows.astype(np.int32),
            cols=cols.astype(np.int32), values=vals)
    b = rng.standard_normal((k, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_ring(a, b, mesh, local="panel"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_panel_local_cols_axis(problem):
    a, b, ref = problem
    mesh = make_mesh((4, 2), ("rows", "cols"))
    out = np.asarray(spmm_ring(a, b, mesh, cols_axis="cols", local="panel"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_panel_local_supertiled():
    """Explicit sm < m_local: every bucket's plan supertiles, the ring
    body's un-supertile reshape runs, and trash panels pinned to the
    LAST supertile must not re-fire the slab zero-init."""
    from tpuspmm.parallel.shard import bucket_panelplans

    rng = np.random.default_rng(23)
    a = CSR.random(128, 256, 0.06, seed=19)
    b = rng.standard_normal((256, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((2,), ("rows",))
    plans = bucket_panelplans(a, 2, 2, sm=32)
    assert plans.n_supertiles > 1
    out = np.asarray(spmm_ring(a, b, mesh, local="panel", plans=plans))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_kshard_panel_local(problem):
    from tpuspmm.parallel import spmm_kshard

    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_kshard(a, b, mesh, local="panel"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_kshard_panel_local_uneven():
    from tpuspmm.parallel import spmm_kshard

    rng = np.random.default_rng(17)
    a = CSR.random(130, 333, 0.07, seed=9)
    b = rng.standard_normal((333, 72)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_kshard(a, b, mesh, local="panel"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_kshard_panel_local_supertiled():
    """Explicit sm < m_local: the full-height partial is supertiled, the
    un-supertile reshape runs inside the psum_scatter callable."""
    from tpuspmm.parallel import spmm_kshard
    from tpuspmm.parallel.shard import bucket_panelplans

    rng = np.random.default_rng(5)
    a = CSR.random(264, 520, 0.06, seed=11)
    b = rng.standard_normal((520, 96)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4,), ("rows",))
    plans = bucket_panelplans(a, 1, 4, sm=64, m_align=4)
    assert plans.n_supertiles > 1
    out = np.asarray(spmm_kshard(a, b, mesh, local="panel", plans=plans))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_kshard_tile_local(problem):
    from tpuspmm.parallel import spmm_kshard

    a, b, ref = problem
    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_kshard(a, b, mesh, local="tile"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_kshard_tile_local_uneven():
    from tpuspmm.parallel import spmm_kshard

    rng = np.random.default_rng(17)
    a = CSR.random(130, 333, 0.07, seed=9)
    b = rng.standard_normal((333, 72)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_kshard(a, b, mesh, local="tile"))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_2d_mesh(problem):
    a, b, ref = problem
    mesh = make_mesh((4, 2))
    out = np.asarray(spmm_2d(a, b, mesh))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


@pytest.mark.parametrize("local", ["panel", "pair"])
def test_2d_mesh_panel_pair_locals(problem, local):
    """2-D schedule serving the flagship panel/pair kernels per (row,
    col) shard: each shard densifies its row slab against its
    n_local-wide B column shard; an uneven width exercises the column
    padding, and a bf16-ingested operand the serving dtype."""
    import ml_dtypes

    a, b, ref = problem
    mesh = make_mesh((4, 2))
    out = np.asarray(spmm_2d(a, b, mesh, local=local))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)

    # uneven width (96 → n_local 128 with padding on the last shard)
    b_odd = b[:, :72]
    out_odd = np.asarray(spmm_2d(a, b_odd, mesh, local=local))
    assert allclose(out_odd, ref[:, :72], 1e-2, 1e-3)

    b16 = b.astype(ml_dtypes.bfloat16)
    ref16 = oracle.spmm_oracle(a, np.asarray(b16).astype(np.float64))
    out16 = np.asarray(spmm_2d(a, b16, mesh, local=local))
    assert out16.dtype == np.float32
    assert allclose(out16, ref16, 1e-2, 1e-3)


def test_weak_scaling_consistency(problem):
    """Same matrix, different shard counts → identical results."""
    a, b, ref = problem
    outs = []
    for n in (1, 2, 8):
        mesh = make_mesh((n,), ("rows",))
        outs.append(np.asarray(spmm_row_sharded(a, b, mesh, local="xla")))
    for o in outs:
        assert allclose(o, ref, 1e-2, 1e-3)


def test_lsq_train_step_descends():
    a = CSR.random(120, 200, 0.1, seed=9)
    mesh = make_mesh((4, 2))
    state = make_train_state(a, n=64, mesh=mesh, seed=1)
    losses = []
    for _ in range(3):
        state, loss = lsq_train_step(state, mesh, lr=1e-7)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_train_grad_matches_autodiff():
    """dB from the hand-written transpose SpMM must equal jax.grad of the
    densified loss."""
    import jax.numpy as jnp

    a = CSR.random(40, 60, 0.2, seed=2)
    mesh = make_mesh((2, 2))
    state = make_train_state(a, n=32, mesh=mesh, seed=4)
    meta = state["meta"]
    a_dense = np.zeros((meta["m_local"] * mesh.shape["rows"], meta["k_pad"]), np.float32)
    ad = a.to_dense()
    a_dense[: ad.shape[0], : ad.shape[1]] = ad
    b0 = np.asarray(state["b"])
    c_t = np.asarray(state["c_target"])

    def loss_fn(bmat):
        r = a_dense @ bmat - c_t
        return 0.5 * jnp.sum(r * r)

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(b0)))
    lr = 1e-2
    new_state, _ = lsq_train_step(state, mesh, lr=lr)
    db = (b0 - np.asarray(new_state["b"])) / lr
    np.testing.assert_allclose(db, g, rtol=1e-3, atol=1e-4)


def test_multihost_single_process_degrades():
    from tpuspmm.parallel import multihost

    info = multihost.process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] == 8
    mesh = multihost.pod_mesh(("rows",))
    assert mesh.shape["rows"] == 8
    mesh2 = multihost.pod_mesh(("rows", "cols"), shape=(4, 2))
    assert mesh2.shape == {"rows": 4, "cols": 2}


def test_profiling_trace_noop(tmp_path):
    from tpuspmm.utils.profiling import trace

    with trace(str(tmp_path / "trace")):
        pass  # must not raise even if the profiler is unavailable


def test_kshard_reduce_scatter(problem):
    from tpuspmm.parallel import spmm_kshard

    a, b, ref = problem
    mesh = make_mesh((4,), ("rows",))
    out = np.asarray(spmm_kshard(a, b, mesh))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_kshard_uneven():
    rng = np.random.default_rng(13)
    a = CSR.random(101, 333, 0.07, seed=8)
    b = rng.standard_normal((333, 24)).astype(np.float32)
    ref = np.asarray(__import__("tpuspmm").spmm(a, b, method="oracle"))
    from tpuspmm.parallel import spmm_kshard

    mesh = make_mesh((8,), ("rows",))
    out = np.asarray(spmm_kshard(a, b, mesh))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_2d_cols_axis(problem):
    """Ring over "rows" with B/C column-sharded over "cols" — the
    ICI-aligned 2-D layout."""
    from tpuspmm.parallel import spmm_ring

    a, b, ref = problem
    mesh = make_mesh((4, 2))
    out = np.asarray(spmm_ring(a, b, mesh, cols_axis="cols"))
    assert out.shape == ref.shape
    assert allclose(out, ref, 1e-2, 1e-3)


def test_2d_mesh_wide_b_not_multiple_of_tile():
    """Regression: B width giving per-device n_local=640 (not a multiple
    of the 512 column tile) used to leave columns 512+ unwritten (NaN)."""
    rng = np.random.default_rng(17)
    a = CSR.random(96, 128, 0.1, seed=6)
    b = rng.standard_normal((128, 1280)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)
    mesh = make_mesh((4, 2))
    out = np.asarray(spmm_2d(a, b, mesh))
    assert not np.isnan(out).any()
    assert allclose(out, ref, 1e-2, 1e-3)


def test_row_sharded_pair_empty_supertile_and_uneven_strips():
    # shard 0: nnz only in its FIRST supertile (second empty → filler
    # chunk, re-aimed at the uniform zero tail); shard 1: dense enough
    # that shard 0's strips need padding to the uniform count
    from tpuspmm.formats import COO
    from tpuspmm.parallel.shard import shard_rows_pairplan

    rng = np.random.default_rng(11)
    m, k = 128, 256
    # shard 0 = rows 0..63: two nnz in rows 0..31 only
    r0 = np.array([3, 17], np.int32)
    c0 = np.array([5, 200], np.int32)
    # shard 1 = rows 64..127: every row occupied
    r1 = np.arange(64, 128, dtype=np.int32)
    c1 = rng.integers(0, k, 64).astype(np.int32)
    rows = np.concatenate([r0, r1])
    cols = np.concatenate([c0, c1])
    vals = rng.uniform(-5, 5, rows.size).astype(np.float32)
    a = COO(shape=(m, k), rows=rows, cols=cols, values=vals)
    b = rng.uniform(-1, 1, (k, 40)).astype(np.float32)
    ref = oracle.spmm_oracle(a, b)

    plan = shard_rows_pairplan(a, 2, sm=32, chunk_strips=8)
    assert plan.n_supertiles == 2
    # shard 0 stored fewer strips than the uniform count (padding hit)
    n_half = plan.chunks_per_shard
    assert (plan.c_count[:n_half] == 0).any()  # filler chunk present
    mesh = make_mesh((2,), ("rows",))
    out = np.asarray(spmm_row_sharded(a, b, mesh, local="pair", plan=plan))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_ring_and_kshard_reject_buckets_with_tile_local():
    """Prebuilt triplet buckets cannot parameterize the tile-local
    schedules (they take tile plans via plans=); passing them must raise,
    not silently rebuild a different plan (review r3)."""
    from tpuspmm.parallel.shard import bucket_triplets

    a = CSR.random(64, 64, 0.05, seed=7)
    b = np.random.default_rng(8).standard_normal((64, 32)).astype(np.float32)
    mesh = make_mesh((8,), ("rows",))
    n_dev = mesh.shape["rows"]
    with pytest.raises(ValueError, match="plans="):
        spmm_ring(a, b, mesh, buckets=bucket_triplets(a, n_dev, n_dev),
                  local="tile")
    with pytest.raises(ValueError, match="plans="):
        __import__("tpuspmm.parallel", fromlist=["spmm_kshard"]).spmm_kshard(
            a, b, mesh, buckets=bucket_triplets(a, 1, n_dev),
                    local="tile")


def test_sharded_schedules_bf16_ingested_operand(problem):
    """bf16-ingested B (--b-dtype bf16 serving mode) through every
    communicating schedule: the shard-local kernels ingest bf16 directly
    (single exact MXU pass), output stays f32, and the gate checks vs
    the f64 oracle OF the bf16 values."""
    import ml_dtypes

    from tpuspmm.parallel import spmm_kshard

    a, b, _ = problem
    b16 = b.astype(ml_dtypes.bfloat16)
    ref16 = oracle.spmm_oracle(a, np.asarray(b16).astype(np.float64))
    mesh = make_mesh((8,), ("rows",))
    for fn in (spmm_row_sharded, spmm_kshard, spmm_ring):
        out = np.asarray(fn(a, b16, mesh))
        assert out.dtype == np.float32, fn.__name__
        assert allclose(out, ref16, 1e-2, 1e-3), fn.__name__
    # and the flagship panel/pair kernels as the communicating schedules'
    # locals (VERDICT r3 #7 pair, r4 #4 panel)
    for fn in (spmm_kshard, spmm_ring):
        for loc in ("pair", "panel"):
            out = np.asarray(fn(a, b16, mesh, local=loc))
            assert allclose(out, ref16, 1e-2, 1e-3), f"{fn.__name__} {loc}"
