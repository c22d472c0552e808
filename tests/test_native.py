"""Native C++ fast-parse layer tests.

The native library is the counterpart of the reference's mmio C reader and
C++ text loaders (SURVEY.md §2.1 N19, N5-N9); every result must agree with
the pure-numpy/scipy fallback bit-for-bit.
"""

import os
import shutil

import numpy as np
import pytest
import scipy.io
import scipy.sparse

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

from tpuspmm.native import fastio

from tpuspmm.data import data_dir

REF_DATA = "/root/reference/data"


@pytest.fixture(scope="module", autouse=True)
def _built():
    if not fastio.available():
        pytest.skip("native build unavailable")


def test_parse_tokens_matches_numpy(tmp_path):
    p = tmp_path / "body.txt"
    p.write_text("header line to skip\n1 2 3\n4.5 -6e3\n7\n")
    got = fastio.parse_tokens(str(p), 1)
    np.testing.assert_array_equal(got, [1, 2, 3, 4.5, -6e3, 7])


def test_parse_tokens_skip_zero(tmp_path):
    p = tmp_path / "b.txt"
    p.write_text("1.25 -2.5\n3.75\n")
    np.testing.assert_array_equal(fastio.parse_tokens(str(p), 0), [1.25, -2.5, 3.75])


def test_mtx_general(tmp_path):
    rng = np.random.default_rng(0)
    sp = scipy.sparse.random(30, 40, density=0.2, format="coo", random_state=rng)
    path = str(tmp_path / "m.mtx")
    scipy.io.mmwrite(path, sp)
    shape, r, c, v = fastio.read_mtx_triplets(path)
    assert shape == (30, 40)
    got = scipy.sparse.coo_matrix((v, (r, c)), shape=shape).toarray()
    np.testing.assert_allclose(got, sp.toarray(), rtol=1e-12)


def test_mtx_symmetric(tmp_path):
    rng = np.random.default_rng(1)
    a = scipy.sparse.random(20, 20, density=0.2, format="coo", random_state=rng)
    sym = (a + a.T).tocoo()
    path = str(tmp_path / "s.mtx")
    scipy.io.mmwrite(path, sym, symmetry="symmetric")
    shape, r, c, v = fastio.read_mtx_triplets(path)
    got = scipy.sparse.coo_matrix((v, (r, c)), shape=shape).toarray()
    np.testing.assert_allclose(got, sym.toarray(), rtol=1e-10)


def test_mtx_pattern(tmp_path):
    path = str(tmp_path / "p.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("% comment\n3 4 2\n1 1\n3 4\n")
    shape, r, c, v = fastio.read_mtx_triplets(path)
    assert shape == (3, 4)
    np.testing.assert_array_equal(r, [0, 2])
    np.testing.assert_array_equal(c, [0, 3])
    np.testing.assert_array_equal(v, [1.0, 1.0])


def test_mtx_reference_files_match_scipy():
    """Every bundled sparse .mtx parses identically via native and scipy."""
    checked = 0
    for dirname in ("small_32x32", "medium_1484", "large_25605"):
        d = data_dir(dirname)
        if d is None:
            continue
        for name in os.listdir(d):
            if not name.endswith(".mtx") or name == "dense.mtx":
                continue
            path = os.path.join(d, name)
            ref = scipy.sparse.coo_matrix(scipy.io.mmread(path))
            try:
                shape, r, c, v = fastio.read_mtx_triplets(path)
            except fastio.NativeUnavailable:
                continue  # dense or skew — scipy fallback covers it
            got = scipy.sparse.coo_matrix((v, (r, c)), shape=shape)
            assert shape == ref.shape
            np.testing.assert_allclose(got.toarray(), ref.toarray(), rtol=1e-12)
            checked += 1
    if not checked:
        pytest.skip("no reference .mtx available")


def test_io_loaders_use_native_consistently(tmp_path):
    """read_csr_text through the native tokenizer == through numpy."""
    from tpuspmm.formats import CSR
    from tpuspmm.formats import io as fio

    a = CSR.random(50, 60, 0.1, seed=3)
    p = str(tmp_path / "a.csr")
    a.save(p)
    shape, indptr, indices, values = fio.read_csr_text(p)
    assert shape == (50, 60)
    np.testing.assert_array_equal(indptr, np.asarray(a.indptr))
    np.testing.assert_array_equal(indices, np.asarray(a.indices))
    np.testing.assert_allclose(values, np.asarray(a.values), rtol=1e-6)
