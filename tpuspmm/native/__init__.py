"""Native (C++) acceleration layer.

Builds ``fastio.cpp`` into a shared library on first import (g++ -O3; the
result is cached next to the source).  Everything here is optional: the
Python loaders fall back to numpy parsing when the toolchain or build is
unavailable, so the framework never hard-depends on a compiler at runtime.
"""

from tpuspmm.native import fastio  # noqa: F401
