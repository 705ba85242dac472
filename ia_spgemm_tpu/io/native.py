"""ctypes bindings to the native C++ MatrixMarket parser.

The reference's I/O layer is C (mmio.c); ours is a C++ shared library
(native/mtxparse.cpp) built with `make -C native`, loaded lazily here.
Falls back to the pure-numpy reader in mmio.py when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmtxparse.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mtx_parse.restype = ctypes.c_int
    lib.mtx_parse.argtypes = [
        ctypes.c_char_p,                     # path
        ctypes.POINTER(ctypes.c_longlong),   # nrows
        ctypes.POINTER(ctypes.c_longlong),   # ncols
        ctypes.POINTER(ctypes.c_longlong),   # nnz (stored)
        ctypes.POINTER(ctypes.c_int),        # field code 0=real 1=int 2=pattern
        ctypes.POINTER(ctypes.c_int),        # symmetry 0=general 1=sym 2=skew
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),     # rows out
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),     # cols out
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),  # vals out
    ]
    lib.mtx_free.restype = None
    lib.mtx_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def build(quiet: bool = True) -> bool:
    """Build the native library in-tree if a toolchain is available."""
    import subprocess
    if os.path.exists(_LIB_PATH):
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       check=True,
                       capture_output=quiet)
    except Exception:
        return False
    global _TRIED
    _TRIED = False
    return os.path.exists(_LIB_PATH)


def available() -> bool:
    return _load() is not None


_FIELD_NAMES = {0: "real", 1: "integer", 2: "pattern"}
_SYM_NAMES = {0: "general", 1: "symmetric", 2: "skew-symmetric"}


def read_mtx(path: str) -> Tuple["MatrixMarketHeader", np.ndarray, np.ndarray, np.ndarray]:
    """Parse with the native library; mirrors mmio.read_mtx's contract."""
    from ia_spgemm_tpu.io.mmio import MatrixMarketHeader, MatrixMarketError

    lib = _load()
    if lib is None:
        raise RuntimeError("native parser not built (run make -C native)")

    nrows = ctypes.c_longlong()
    ncols = ctypes.c_longlong()
    nnz = ctypes.c_longlong()
    field = ctypes.c_int()
    sym = ctypes.c_int()
    rows_p = ctypes.POINTER(ctypes.c_int)()
    cols_p = ctypes.POINTER(ctypes.c_int)()
    vals_p = ctypes.POINTER(ctypes.c_double)()

    rc = lib.mtx_parse(path.encode(), ctypes.byref(nrows), ctypes.byref(ncols),
                       ctypes.byref(nnz), ctypes.byref(field),
                       ctypes.byref(sym), ctypes.byref(rows_p),
                       ctypes.byref(cols_p), ctypes.byref(vals_p))
    if rc != 0:
        msgs = {-1: "cannot open file", -2: "bad banner",
                -3: "data type 'COMPLEX' is not supported",
                -4: "bad size line", -5: "bad entry", -6: "out of memory"}
        raise MatrixMarketError(f"{msgs.get(rc, 'parse error')} ({path})")

    n = nnz.value
    try:
        rows = np.ctypeslib.as_array(rows_p, shape=(n,)).copy() if n else np.zeros(0, np.int32)
        cols = np.ctypeslib.as_array(cols_p, shape=(n,)).copy() if n else np.zeros(0, np.int32)
        vals = np.ctypeslib.as_array(vals_p, shape=(n,)).copy() if n else np.zeros(0, np.float64)
    finally:
        lib.mtx_free(rows_p)
        lib.mtx_free(cols_p)
        lib.mtx_free(vals_p)

    header = MatrixMarketHeader(
        "matrix", "coordinate", _FIELD_NAMES[field.value],
        _SYM_NAMES[sym.value], int(nrows.value), int(ncols.value), n)
    return header, rows, cols, vals
