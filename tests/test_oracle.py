"""Oracle semantics: every per-format oracle matches scipy and the
committed golden fixture (tier-2 of the reference's test strategy,
reference/utils/python_utils/validate.py + data/small_*/result.expect).
"""

import os

import numpy as np
import pytest
import scipy.sparse

from tpuspmm.formats import CSR, COO, BSR, ELL, DenseMatrix, convert
from tpuspmm.ops import oracle


def _rand(m, k, density, seed=0):
    rng = np.random.default_rng(seed)
    return scipy.sparse.random(
        m, k, density=density, format="csr", random_state=rng,
        data_rvs=lambda n: rng.uniform(-100, 100, n),
    )


@pytest.mark.parametrize("fmt", ["csr", "coo", "bsr", "ell"])
def test_oracle_matches_scipy(fmt):
    sp = _rand(70, 90, 0.08, seed=fmt.__hash__() % 100)
    a = convert.to_format(sp, fmt)
    rng = np.random.default_rng(1)
    b = rng.uniform(-1, 1, (90, 33)).astype(np.float32)
    got = oracle.spmm_oracle(a, b)
    want = oracle.spmm_scipy_oracle(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_oracle_against_golden_expect(small32_dir):
    """Match the committed golden output result.expect
    (reference/data/small_32x32/result.expect, written by
    reference/utils/python_utils/validate.py:22-29)."""
    a = CSR.from_file(os.path.join(small32_dir, "Hamrle1.csr"))
    b = DenseMatrix.from_file(os.path.join(small32_dir, "dense.in"))
    expect = np.loadtxt(os.path.join(small32_dir, "result.expect"), dtype=np.float64)
    got = oracle.spmm_csr_oracle(a, np.asarray(b.data))
    np.testing.assert_allclose(got, expect.astype(np.float32), rtol=1e-4, atol=1e-4)


def test_oracle_against_golden_expect_small10(small10_dir):
    a = CSR.from_file(os.path.join(small10_dir, "sparse.csr"))
    b = DenseMatrix.from_file(os.path.join(small10_dir, "dense.in"))
    expect = np.loadtxt(os.path.join(small10_dir, "result.expect"), dtype=np.float64)
    got = oracle.spmm_csr_oracle(a, np.asarray(b.data))
    np.testing.assert_allclose(got, expect.astype(np.float32), rtol=1e-4, atol=1e-4)


def test_ell_oracle_with_padding():
    """ELL padding slots (-1 rows) must not contribute
    (reference/src/formats/sparse_ell.cu:12-55 -1 sentinel)."""
    dense = np.zeros((4, 3), dtype=np.float32)
    dense[0, 0] = 1.0
    dense[2, 0] = 2.0
    dense[1, 2] = 3.0
    a = ELL.from_dense(dense)
    assert a.max_col_nnz == 2
    b = np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(oracle.spmm_ell_oracle(a, b), dense)
