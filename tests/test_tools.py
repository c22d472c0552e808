"""Offline-tooling tests: converter round-trips, generator, validator.

Mirrors the reference's tier-2 validation (scipy oracle + golden files,
SURVEY.md §4) as actual unit tests.
"""

import os

import numpy as np
import pytest
import scipy.io
import scipy.sparse

from tpuspmm.formats import CSR, COO, BSR, ELL, convert
from tpuspmm.formats import io as fio
from tpuspmm.tools.convert_mtx import convert_dir
from tpuspmm.tools.gen_sparse import gen_dir
from tpuspmm.tools.validate import compute_expect, write_expect, read_result, validate_dir


@pytest.fixture()
def mtx_dir(tmp_path):
    """A data dir with a sparse .mtx and a dense.mtx, reference-style."""
    rng = np.random.default_rng(0)
    sp = scipy.sparse.random(24, 36, density=0.15, format="coo", random_state=rng,
                             data_rvs=lambda n: rng.uniform(-10, 10, n))
    scipy.io.mmwrite(str(tmp_path / "testmat.mtx"), sp)
    dense = rng.uniform(-1, 1, (36, 8)).astype(np.float32)
    scipy.io.mmwrite(str(tmp_path / "dense.mtx"), dense)
    return str(tmp_path), sp, dense


def test_convert_dir_all_formats(mtx_dir):
    d, sp, dense = mtx_dir
    written = convert_dir(d, block_size=4)
    names = {os.path.basename(w) for w in written}
    assert {"testmat.csr", "testmat.coo", "testmat.bsr",
            "testmat_rowind.ell", "testmat_values_colmajor.ell",
            "testmat_colind.ell", "testmat_values.ell", "dense.in"} <= names

    ref = sp.toarray()
    assert np.allclose(CSR.from_file(os.path.join(d, "testmat.csr")).to_dense(), ref, atol=1e-5)
    assert np.allclose(COO.from_file(os.path.join(d, "testmat.coo")).to_dense(), ref, atol=1e-5)
    assert np.allclose(BSR.from_file(os.path.join(d, "testmat.bsr")).to_dense(), ref, atol=1e-5)
    ell = ELL.from_file(os.path.join(d, "testmat_rowind.ell"),
                        os.path.join(d, "testmat_values_colmajor.ell"))
    assert np.allclose(ell.to_dense(), ref, atol=1e-5)
    got_dense = fio.read_dense_text(os.path.join(d, "dense.in"))
    assert np.allclose(got_dense, dense, atol=1e-5)


def test_convert_bsr_nontrivial_blocks(mtx_dir):
    """The converter must honour real block sizes (the reference forces
    1×1, reference convert_mtx.py:22 — a quirk we don't replicate)."""
    d, sp, _ = mtx_dir
    convert_dir(d, block_size=4, formats=["bsr"])
    b = BSR.from_file(os.path.join(d, "testmat.bsr"))
    assert b.block_size == (4, 4)


def test_gen_sparse_dir(tmp_path):
    d = gen_dir(str(tmp_path), 0.3, 64, 64, 16, seed=1)
    a = CSR.from_file(os.path.join(d, "sparse.csr"))
    coo = COO.from_file(os.path.join(d, "sparse.coo"))
    b = fio.read_dense_text(os.path.join(d, "dense.in"))
    assert a.shape == (64, 64)
    assert b.shape == (64, 16)
    assert np.allclose(a.to_dense(), coo.to_dense(), atol=1e-5)
    assert 0.2 < a.sparsity < 0.4


def test_validate_round_trip(mtx_dir, tmp_path):
    d, sp, dense = mtx_dir
    expect = compute_expect(d)
    assert np.allclose(expect, sp.toarray() @ dense, rtol=1e-4, atol=1e-5)
    path = write_expect(d, expect)
    back = read_result(path)
    assert np.allclose(back, expect, atol=1e-6)

    # a correct .out passes, a corrupted one fails (headerless layout,
    # matching the reference's committed coo.out fixtures)
    def write_out(name, mat):
        with open(os.path.join(d, name), "w") as f:
            for row in mat:
                f.write(" ".join(f"{v:.10f}" for v in row) + "\n")

    write_out("good.out", expect)
    assert validate_dir(d) == 0
    bad = expect.copy()
    bad[0, 0] += 100.0
    write_out("bad.out", bad)
    assert validate_dir(d) == 1


def test_reference_golden_expect(small10_dir):
    """Our oracle must reproduce the reference's committed result.expect
    (reference/data/small_10x10/result.expect, golden fixture per
    SURVEY.md §4 tier 2)."""
    expect_path = os.path.join(small10_dir, "result.expect")
    if not os.path.exists(expect_path):
        pytest.skip("golden file missing")
    golden = read_result(expect_path)
    ours = compute_expect(small10_dir)
    assert ours.shape == golden.shape
    assert np.allclose(ours, golden, rtol=1e-6, atol=1e-6)


def test_converted_files_loadable_by_cli_discovery(mtx_dir):
    d, _, _ = mtx_dir
    convert_dir(d)
    found = convert.discover(d)
    assert found["csr"] and found["coo"] and found["bsr"]
    assert found["ell_rowind"] and found["ell_values"] and found["dense"]
