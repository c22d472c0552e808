"""ctypes binding + build-on-demand for the native tile-plan builder.

The tile plan (tpuspmm/formats/tiles.py) is the framework's host-side
prolog — the analogue of the reference's native loaders + H2D layout
stage (reference/src/formats/*.cu).  The C++ builder replaces the numpy
argsort+gather pipeline for large matrices; `build_tile_plan_arrays`
returns exactly the arrays the Python implementation produces (the test
suite asserts bit-for-bit parity), and callers fall back to numpy when
the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tileplan.cpp")
_LIB_PATH = os.path.join(_HERE, "_tileplan.so")
_lock = threading.Lock()
_lib = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    # compile to a process-unique temp name, then os.rename (atomic on
    # POSIX): a concurrent process never dlopens a half-written .so
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.rename(tmp, _LIB_PATH)
    except Exception as e:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise NativeUnavailable(f"native build failed: {e}") from e
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            # stale/corrupt artifact (e.g. from an interrupted older
            # build) — rebuild once, then let a real failure propagate
            # as NativeUnavailable so callers fall back to numpy
            _build()
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError as e:
                raise NativeUnavailable(f"dlopen failed: {e}") from e
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tile_plan_begin.restype = ctypes.c_void_p
        lib.tile_plan_begin.argtypes = [
            i64p, i64p, f32p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p,
        ]
        lib.tile_plan_fill.restype = None
        lib.tile_plan_fill.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            i32p, i32p, i32p, i32p, i32p, f32p,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    if os.environ.get("TPUSPMM_NO_NATIVE"):
        return False
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def build_tile_plan_arrays(rows, cols, vals, shape, tile_m, tile_k, chunk):
    """(rt, kt, first, rows, cols, vals) plan arrays via the C++ builder.

    Raises NativeUnavailable when the library can't be built/loaded."""
    lib = _load()
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    nnz = rows.shape[0]

    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    n_chunks = ctypes.c_int64()
    state = lib.tile_plan_begin(
        rows.ctypes.data_as(i64p), cols.ctypes.data_as(i64p),
        vals.ctypes.data_as(f32p), nnz,
        int(shape[0]), int(shape[1]),
        int(tile_m), int(tile_k), int(chunk),
        ctypes.byref(n_chunks),
    )
    if not state:
        raise NativeUnavailable("tile_plan_begin failed")
    C, E = n_chunks.value, int(chunk)
    # outputs are numpy-owned (no copy-out); sentinel defaults pre-filled,
    # the fill pass only writes real slots
    rt = np.zeros(C, np.int32)
    kt = np.zeros(C, np.int32)
    first = np.zeros(C, np.int32)
    prows = np.full((C, E), -1, np.int32)
    pcols = np.zeros((C, E), np.int32)
    pvals = np.zeros((C, E), np.float32)
    lib.tile_plan_fill(
        state, C,
        rt.ctypes.data_as(i32p), kt.ctypes.data_as(i32p),
        first.ctypes.data_as(i32p), prows.ctypes.data_as(i32p),
        pcols.ctypes.data_as(i32p), pvals.ctypes.data_as(f32p),
    )
    return rt, kt, first, prows, pcols, pvals
