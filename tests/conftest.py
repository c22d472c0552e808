"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no unit-test framework (SURVEY.md §4); this suite is the
new build's tier-1 gate.  Kernels run in Pallas interpret mode on the CPU
backend, and distributed tests use 8 virtual CPU devices — the environment
forces the `axon` TPU platform via sitecustomize, so the platform must be
overridden through jax.config before any backend is initialized.
"""

import os
import sys

os.environ.setdefault("TPUSPMM_INTERPRET", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/data"
sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small32_dir():
    d = os.path.join(REF_DATA, "small_32x32")
    if not os.path.isdir(d):
        pytest.skip("reference data not available")
    return d


@pytest.fixture(scope="session")
def small10_dir():
    d = os.path.join(REF_DATA, "small_10x10")
    if not os.path.isdir(d):
        pytest.skip("reference data not available")
    return d
