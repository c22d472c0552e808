"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no unit-test framework (SURVEY.md §4); this suite is the
new build's tier-1 gate.  Kernels run in Pallas interpret mode on the CPU
backend, and distributed tests use 8 virtual CPU devices — the environment
forces the `axon` TPU platform via sitecustomize, so the platform must be
overridden through jax.config before any backend is initialized.
"""

import os
import sys
import tempfile

os.environ.setdefault("TPUSPMM_INTERPRET", "1")
# keep autotune's on-disk ranking cache out of the user cache (and out of
# other test runs) — rankings measured under interpret mode are meaningless
os.environ["TPUSPMM_TUNE_CACHE"] = os.path.join(
    tempfile.mkdtemp(prefix="tpuspmm-test-"), "tune.json")
# same for the panel geometry cache — tests must neither read a stale
# user-cache geometry nor write test geometries into it
os.environ["TPUSPMM_GEOM_CACHE"] = os.path.join(
    tempfile.mkdtemp(prefix="tpuspmm-test-"), "geom.json")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tpuspmm.data import data_dir  # noqa: E402  (after sys.path insert)

# kept for tests that exercise the reference-mount fallback explicitly
REF_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small32_dir():
    d = data_dir("small_32x32")
    if d is None:
        pytest.skip("corpus data not available")
    return d


@pytest.fixture(scope="session")
def small10_dir():
    d = data_dir("small_10x10")
    if d is None:
        pytest.skip("corpus data not available")
    return d
