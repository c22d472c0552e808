"""Dtype breadth: bf16 dense-operand ingestion and f64 value containers.

The reference templates its engines over <DT, MT, AccT> and instantiates
float and double (reference/src/engine/engine.cpp:63-80) though only
float32 is effectively exercised (SURVEY.md §2.5).  The rebuild's answer:

- B may be ingested in bfloat16 (the pruned-LLM serving dtype): every
  compute path accumulates in >= f32 and is gate-checked against the f64
  oracle *of the bf16-ingested operand*;
- containers carry any numpy value dtype via .astype(); the f64 path
  serves the oracle/validation tier.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuspmm.formats import CSR, convert
from tpuspmm.ops import oracle, xla
from tpuspmm.kernels import cres_spmm, tile_spmm, csr_vmem
from tpuspmm.utils.compare import allclose


@pytest.fixture(scope="module")
def case():
    a = CSR.random(200, 300, 0.05, seed=21, lo=-1, hi=1)
    rng = np.random.default_rng(22)
    b32 = rng.standard_normal((300, 64)).astype(np.float32)
    b16 = jnp.asarray(b32, dtype=jnp.bfloat16)
    # the oracle of the *ingested* operand: f64 of the bf16 values
    ref = oracle.spmm_oracle(a, np.asarray(b16).astype(np.float64))
    return a, b16, ref


def test_bf16_ingestion_pallas_kernels(case):
    a, b16, ref = case
    for name, fn in [
        ("tile", lambda: tile_spmm.spmm_tile_sparse(a, b16, interpret=True)),
        ("cres", lambda: cres_spmm.spmm_cres(a, b16, interpret=True)),
        ("staged", lambda: csr_vmem.spmm_staged(a, b16, interpret=True)),
    ]:
        out = np.asarray(fn())
        assert out.dtype == np.float32, name  # f32 accumulation/output
        assert allclose(out, ref, 1e-2, 1e-3), name


def test_bf16_ingestion_xla_paths(case):
    a, b16, ref = case
    out = np.asarray(xla.spmm_csr_xla(a, b16))
    assert out.dtype == np.float32
    assert allclose(out, ref, 1e-2, 1e-3)
    out = np.asarray(xla.spmm_densify(
        jnp.asarray(np.asarray(a.to_coo().rows)),
        jnp.asarray(np.asarray(a.to_coo().cols)),
        jnp.asarray(np.asarray(a.to_coo().values)), b16,
        num_rows=a.shape[0], num_cols=a.shape[1]))
    assert out.dtype == np.float32
    assert allclose(out, ref, 1e-2, 1e-3)


def test_bf16_ingestion_bsr_ell(case):
    a, b16, ref = case
    bsr = convert.to_format(a.to_scipy(), "bsr")
    out = np.asarray(xla.spmm_bsr_xla(bsr, b16))
    assert allclose(out, ref, 1e-2, 1e-3)
    ell = convert.to_format(a.to_scipy(), "ell")
    out = np.asarray(xla.spmm_ell_xla(ell, b16))
    assert allclose(out, ref, 1e-2, 1e-3)


def test_f64_value_containers():
    a = CSR.random(60, 80, 0.1, seed=23)
    a64 = a.astype(np.float64)
    assert a64.value_dtype == np.float64
    assert a64.nnz == a.nnz
    b = np.random.default_rng(24).standard_normal((80, 16))
    # the f64 oracle of the f64 container equals numpy dense math exactly
    out = oracle.spmm_oracle(a64, b)
    expect = a.to_scipy().astype(np.float64) @ b
    np.testing.assert_allclose(out, expect.astype(np.float32), rtol=1e-6)


def test_astype_round_trip_bf16_values():
    import ml_dtypes

    a = CSR.random(50, 50, 0.1, seed=25, lo=-1, hi=1)
    a16 = a.astype(ml_dtypes.bfloat16)
    assert a16.value_dtype == ml_dtypes.bfloat16
    back = a16.astype(np.float32)
    # bf16 round trip loses at most 2^-9 relative
    np.testing.assert_allclose(np.asarray(back.values),
                               np.asarray(a.values), rtol=4e-3)


def test_bf16_ingestion_panel_pair(case):
    """The flagship panel/pair kernels accept bf16-ingested B and stay
    gate-exact vs the f64 oracle of the bf16 operand (the pruned-LLM
    serving mode measured as bf16_serving_ms in bench.py)."""
    from tpuspmm.kernels import panel_spmm, pair_spmm

    a, b16, ref = case
    for name, fn in [
        ("panel", lambda: panel_spmm.spmm_panel(a, b16, interpret=True)),
        ("pair", lambda: pair_spmm.spmm_pair(a, b16, interpret=True)),
    ]:
        out = np.asarray(fn())
        assert out.dtype == np.float32, name
        assert allclose(out, ref, 1e-2, 1e-3), name


def _count_dots(fn, *args):
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    return str(jaxpr).count("dot_general")


def test_panel_matmul_pass_ladder():
    """panel_matmul picks the cheapest MXU-pass ladder for the operand
    dtypes: bf16 plan x bf16 B is ONE exact pass (the bf16-serving win
    bench.py measures), bf16 plan x f32 B is 3 passes gate-exact at
    'highest' and 2 at the verified-only tier, f32 x f32 'highest' is a
    single HIGHEST dot."""
    from tpuspmm.kernels.panel_spmm import panel_matmul

    a16 = jnp.zeros((32, 128), jnp.bfloat16)
    a32 = jnp.zeros((32, 128), jnp.float32)
    b16 = jnp.zeros((128, 64), jnp.bfloat16)
    b32 = jnp.zeros((128, 64), jnp.float32)
    # (a dtype, b dtype, internal mode) -> expected dot_general count
    assert _count_dots(lambda x, y: panel_matmul(x, y, "highest"), a16, b16) == 1
    assert _count_dots(lambda x, y: panel_matmul(x, y, "split"), a16, b16) == 1
    assert _count_dots(lambda x, y: panel_matmul(x, y, "highest"), a16, b32) == 3
    assert _count_dots(lambda x, y: panel_matmul(x, y, "split"), a16, b32) == 2
    assert _count_dots(lambda x, y: panel_matmul(x, y, "highest"), a32, b16) == 3
    assert _count_dots(lambda x, y: panel_matmul(x, y, "split"), a32, b16) == 2
    assert _count_dots(lambda x, y: panel_matmul(x, y, "highest"), a32, b32) == 1
