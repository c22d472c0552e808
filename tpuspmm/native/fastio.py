"""ctypes binding + build-on-demand for the native parsing library.

The reference ships its I/O natively (C mmio lib + C++ loaders,
reference/utils/utils/mmio.c, reference/src/formats/*.cu text ctors); this
module is the equivalent runtime: `parse_tokens` feeds every text-format
loader in tpuspmm/formats/io.py, `read_mtx_triplets` is the fast
MatrixMarket path (~10× numpy tokenization on the large matrices).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastio.cpp")
_LIB_PATH = os.path.join(_HERE, "_fastio.so")
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
            # stale/corrupt artifact — rebuild once; a persistent failure
            # surfaces as NativeUnavailable so callers fall back to Python
            _build()
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError as e:
                raise NativeUnavailable(f"dlopen failed: {e}") from e
        lib.tokenize_file.restype = ctypes.c_int
        lib.tokenize_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.read_mtx_coord.restype = ctypes.c_int
        lib.read_mtx_coord.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.free_buffer.argtypes = [ctypes.POINTER(ctypes.c_double)]
        lib.free_ibuffer.argtypes = [ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def parse_tokens(path: str, skip_lines: int = 0) -> np.ndarray:
    """Whitespace-tokenized doubles of the file body after `skip_lines`."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_double)()
    n = ctypes.c_int64()
    rc = lib.tokenize_file(path.encode(), skip_lines, ctypes.byref(out),
                           ctypes.byref(n))
    if rc != 0:
        raise NativeUnavailable(f"tokenize_file({path!r}) rc={rc}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.free_buffer(out)
    return arr


def read_mtx_triplets(path: str):
    """Fast MatrixMarket coordinate parse.

    Returns (shape, rows, cols, values) with symmetric halves expanded
    (the Python-side analogue of scipy.io.mmread's symmetry handling).
    Raises NativeUnavailable for array-format (dense) .mtx — callers fall
    back to scipy.
    """
    lib = _load()
    R = ctypes.c_int64()
    C = ctypes.c_int64()
    NZ = ctypes.c_int64()
    r = ctypes.POINTER(ctypes.c_int32)()
    c = ctypes.POINTER(ctypes.c_int32)()
    v = ctypes.POINTER(ctypes.c_double)()
    sym = ctypes.c_int32()
    pat = ctypes.c_int32()
    rc = lib.read_mtx_coord(path.encode(), ctypes.byref(R), ctypes.byref(C),
                            ctypes.byref(NZ), ctypes.byref(r), ctypes.byref(c),
                            ctypes.byref(v), ctypes.byref(sym), ctypes.byref(pat))
    if rc != 0:
        raise NativeUnavailable(f"read_mtx_coord({path!r}) rc={rc}")
    try:
        rows = np.ctypeslib.as_array(r, shape=(NZ.value,)).copy()
        cols = np.ctypeslib.as_array(c, shape=(NZ.value,)).copy()
        vals = np.ctypeslib.as_array(v, shape=(NZ.value,)).copy()
    finally:
        lib.free_ibuffer(r)
        lib.free_ibuffer(c)
        lib.free_buffer(v)
    if sym.value == 2:  # skew-symmetric / hermitian: let scipy handle it
        raise NativeUnavailable(f"{path!r}: skew/hermitian symmetry")
    if sym.value == 1:
        r0, c0, v0 = rows, cols, vals
        off = r0 != c0
        rows = np.concatenate([r0, c0[off]])
        cols = np.concatenate([c0, r0[off]])
        vals = np.concatenate([v0, v0[off]])
    return (int(R.value), int(C.value)), rows, cols, vals
