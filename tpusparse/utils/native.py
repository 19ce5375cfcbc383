"""ctypes bindings for the native C++ runtime (libtpusparse.so).

Native components (built via ``make -C native``):
  * ``mtx_read``      — OpenMP-chunked Matrix Market parser (the
    reference's data-loading path is C++ too, sparse_matrix.h:211-380).
  * ``ic0_factorize`` — sequential IC(0) with diagonal-shift retries.

Everything degrades gracefully: if the library is missing, callers use
the pure-Python implementations (market.py, precond/ic0.py).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        "native",
        "libtpusparse.so",
    )


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        # first use: try a one-shot build (the .so is a build artifact,
        # not committed)
        native_dir = os.path.dirname(path)
        if os.path.exists(os.path.join(native_dir, "Makefile")):
            import subprocess

            try:
                subprocess.run(
                    ["make", "-C", native_dir], check=False,
                    capture_output=True, timeout=120,
                )
            except Exception:
                pass
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.mtx_read.restype = ctypes.c_int
        lib.mtx_read.argtypes = [
            ctypes.c_char_p, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mtx_free.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.argsort_u64.restype = None
        lib.argsort_u64.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.uint64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
        ]
        lib.ic0_factorize.restype = ctypes.c_int
        lib.ic0_factorize.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int, ctypes.c_double,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def argsort_u64(keys: np.ndarray) -> np.ndarray:
    """Parallel argsort of packed uint64 keys (not stable — pack full
    disambiguation into the key). Falls back to numpy when the native
    library is unavailable."""
    lib = _load()
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    if lib is None:
        return np.argsort(keys)
    out = np.empty(keys.shape[0], dtype=np.int64)
    lib.argsort_u64(keys.shape[0], keys, out)
    return out


def read_market(path, default_value=1.0, dtype=np.float64):
    """Native .mtx parse -> CooMatrix. Raises on unsupported (array
    format) so the caller can fall back."""
    from tpusparse.formats.coo import CooMatrix

    lib = _load()
    nr = ctypes.c_int64()
    nc = ctypes.c_int64()
    nnz = ctypes.c_int64()
    prow = ctypes.POINTER(ctypes.c_int32)()
    pcol = ctypes.POINTER(ctypes.c_int32)()
    pval = ctypes.POINTER(ctypes.c_double)()
    is_array = ctypes.c_int32()
    rc = lib.mtx_read(
        str(path).encode(), float(default_value),
        ctypes.byref(nr), ctypes.byref(nc), ctypes.byref(nnz),
        ctypes.byref(prow), ctypes.byref(pcol), ctypes.byref(pval),
        ctypes.byref(is_array),
    )
    if rc == 4:  # array format: python path handles it
        raise ImportError("array-format .mtx — python parser required")
    if rc != 0:
        raise IOError(f"native mtx_read failed with code {rc}: {path}")
    n = nnz.value
    rows = np.ctypeslib.as_array(prow, shape=(n,)).copy()
    cols = np.ctypeslib.as_array(pcol, shape=(n,)).copy()
    vals = np.ctypeslib.as_array(pval, shape=(n,)).copy()
    lib.mtx_free(prow, pcol, pval)
    return CooMatrix(int(nr.value), int(nc.value), rows, cols,
                     vals.astype(dtype))


def ic0_factorize(csr, max_attempts=20, initial_shift=1e-3):
    """Native IC(0). ``csr`` is the full SPD matrix; lower-triangle
    extraction happens here (same as the Python path)."""
    from tpusparse.formats.csr import CsrMatrix
    from tpusparse.precond.ic0 import _lower_triangle

    lib = _load()
    L = _lower_triangle(csr.to_host())
    ro = np.ascontiguousarray(np.asarray(L.row_offsets), dtype=np.int64)
    ci = np.ascontiguousarray(np.asarray(L.col_indices), dtype=np.int64)
    vin = np.ascontiguousarray(np.asarray(L.values), dtype=np.float64)
    vout = np.empty_like(vin)
    attempts = lib.ic0_factorize(
        L.num_rows, ro, ci, vin, vout, int(max_attempts),
        float(initial_shift),
    )
    if attempts == 0:
        raise RuntimeError(
            f"IC(0) failed after {max_attempts} diagonal-shift attempts"
        )
    return CsrMatrix(L.num_rows, L.num_cols, L.row_offsets,
                     L.col_indices, vout)
