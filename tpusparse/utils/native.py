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
    # (re)build on use: a no-op when the .so is fresh, and keeps a
    # stale .so (missing newly added symbols) from breaking the
    # bindings below
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
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
        lib.merge_tiles_count.restype = ctypes.c_int64
        lib.merge_tiles_count.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.merge_tiling_counts.restype = None
        lib.merge_tiling_counts.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p, ctypes.c_int64,
            ctypes.c_int32, i64p, ctypes.c_int32, i64p, i64p,
        ]
        lib.merge_tiles_fill.restype = ctypes.c_int32
        lib.merge_tiles_fill.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p,
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, i32p,
            i32p, i32p, i32p, i32p,
        ]
        lib.coo_sort_order.restype = None
        lib.coo_sort_order.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i32p, i32p, i64p,
        ]
        lib.block_tiles_plan.restype = None
        lib.block_tiles_plan.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p, ctypes.c_int64,
            ctypes.c_int32, i64p, i64p, i32p,
            i64p, i64p, i64p, i64p,
        ]
        lib.block_tiles_count.restype = ctypes.c_int64
        lib.block_tiles_count.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, i64p,
        ]
        lib.block_tiles_fill.restype = ctypes.c_int32
        lib.block_tiles_fill.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p,
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, i32p, i32p, i32p, i32p, i32p,
            ctypes.c_void_p,
        ]
        lib.ell_jobs_per_rowblock.restype = None
        lib.ell_jobs_per_rowblock.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i32p, i64p,
        ]
        lib.ell_tiles_fill.restype = ctypes.c_int32
        lib.ell_tiles_fill.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i32p,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64,
            i64p, ctypes.c_int64,
            ctypes.c_void_p, i32p, i32p,
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
        lib.tri_levels.restype = ctypes.c_int32
        lib.tri_levels.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
        ]
        _LIB = lib
    except (OSError, AttributeError):  # missing .so or stale symbols
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


def _csr_buffers(csr):
    ro = np.ascontiguousarray(np.asarray(csr.row_offsets), dtype=np.int64)
    ci = np.ascontiguousarray(np.asarray(csr.col_indices), dtype=np.int32)
    return ro, ci


def merge_tiling_counts(csr, tile_nnz, row_windows, col_windows):
    """Tile counts for every (row_window, col_window) candidate pair in
    one native call — the tuner input that replaces per-pair numpy
    cluster sorts. Returns an (len(row_windows), len(col_windows))
    int64 array, or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ro, ci = _csr_buffers(csr)
    wrs = np.asarray(list(row_windows), dtype=np.int64)
    wcs = np.asarray(list(col_windows), dtype=np.int64)
    out = np.zeros((wrs.size, wcs.size), dtype=np.int64)
    lib.merge_tiling_counts(
        csr.num_rows, csr.num_cols, int(ci.size), ro, ci, int(tile_nnz),
        np.int32(wrs.size), wrs, np.int32(wcs.size), wcs,
        out.reshape(-1),
    )
    return out


def build_merge_tiles(csr, tile_nnz, row_window, col_window):
    """Native merge-tile partition (bit-identical to the numpy builder
    in formats/tiles.py — exact-equality tested). Returns the payload
    tuple (vals, local_cols, end_pos, row_block, col_block, col_span)
    or None when the native library is unavailable / errors."""
    lib = _load()
    if lib is None:
        return None
    ro, ci = _csr_buffers(csr)
    va = np.ascontiguousarray(np.asarray(csr.values))
    nnz = int(ci.size)
    T, Wr, Wc = int(tile_nnz), int(row_window), int(col_window)
    ntiles = lib.merge_tiles_count(
        csr.num_rows, csr.num_cols, nnz, ro, ci, T, Wr, Wc
    )
    if ntiles <= 0:
        return None
    vals_t = np.zeros((ntiles, T), dtype=va.dtype)
    lcols_t = np.zeros((ntiles, T), dtype=np.int32)
    epos_t = np.full((ntiles, Wr), -1, dtype=np.int32)
    rblk = np.zeros(ntiles, dtype=np.int32)
    cblk = np.zeros(ntiles, dtype=np.int32)
    cspan = np.zeros(ntiles, dtype=np.int32)
    rc = lib.merge_tiles_fill(
        csr.num_rows, csr.num_cols, nnz, ro, ci,
        va.ctypes.data_as(ctypes.c_void_p),
        np.int32(va.dtype.itemsize), T, Wr, Wc, ntiles,
        vals_t.ctypes.data_as(ctypes.c_void_p), lcols_t.reshape(-1),
        epos_t.reshape(-1), rblk, cblk, cspan,
    )
    if rc != 0:
        return None
    return vals_t, lcols_t, epos_t, rblk, cblk, cspan


def block_tiles_plan(csr, tile_nnz, candidates):
    """Tuner stats for greedy block/window tile candidates in one
    native call. ``candidates``: iterable of (row_window, max_blocks,
    contiguous) triples. Returns (ntiles, span_sum, span_hist, span_max)
    arrays — hist is (ncand, 8) pow2 col-span buckets — or None when
    the native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "block_tiles_plan"):
        return None
    ro, ci = _csr_buffers(csr)
    cand = list(candidates)
    wrs = np.asarray([c[0] for c in cand], dtype=np.int64)
    gs = np.asarray([c[1] for c in cand], dtype=np.int64)
    cont = np.asarray([1 if c[2] else 0 for c in cand], dtype=np.int32)
    n = len(cand)
    nt = np.zeros(n, dtype=np.int64)
    ss = np.zeros(n, dtype=np.int64)
    hist = np.zeros((n, 8), dtype=np.int64)
    mx = np.zeros(n, dtype=np.int64)
    lib.block_tiles_plan(
        csr.num_rows, csr.num_cols, int(ci.size), ro, ci, int(tile_nnz),
        np.int32(n), wrs, gs, cont, nt, ss, hist.reshape(-1), mx,
    )
    return nt, ss, hist, mx


def build_block_tiles(csr, tile_nnz, row_window, max_blocks, contiguous):
    """Native greedy block-tile partition (bit-identical to the numpy
    builder — exact-equality tested). Returns the payload tuple
    (vals, local_cols, end_pos, row_block, col_block, col_span,
    blk_list-or-None) or None when unavailable / errors."""
    lib = _load()
    if lib is None or not hasattr(lib, "block_tiles_fill"):
        return None
    ro, ci = _csr_buffers(csr)
    va = np.ascontiguousarray(np.asarray(csr.values))
    nnz = int(ci.size)
    T, Wr, G = int(tile_nnz), int(row_window), int(max_blocks)
    mx = np.zeros(1, dtype=np.int64)
    ntiles = lib.block_tiles_count(
        csr.num_rows, csr.num_cols, nnz, ro, ci, T, Wr, G,
        np.int32(1 if contiguous else 0), mx,
    )
    if ntiles <= 0:
        return None
    Gmax = max(int(mx[0]), 1)
    vals_t = np.zeros((ntiles, T), dtype=va.dtype)
    lcols_t = np.zeros((ntiles, T), dtype=np.int32)
    epos_t = np.full((ntiles, Wr), -1, dtype=np.int32)
    rblk = np.zeros(ntiles, dtype=np.int32)
    cblk = np.zeros(ntiles, dtype=np.int32)
    cspan = np.zeros(ntiles, dtype=np.int32)
    blk_list = (None if contiguous
                else np.zeros((ntiles, Gmax), dtype=np.int32))
    rc = lib.block_tiles_fill(
        csr.num_rows, csr.num_cols, nnz, ro, ci,
        va.ctypes.data_as(ctypes.c_void_p),
        np.int32(va.dtype.itemsize), T, Wr, G,
        np.int32(1 if contiguous else 0), int(ntiles), Gmax,
        vals_t.ctypes.data_as(ctypes.c_void_p), lcols_t.reshape(-1),
        epos_t.reshape(-1), rblk, cblk, cspan,
        None if blk_list is None
        else blk_list.ctypes.data_as(ctypes.c_void_p),
    )
    if rc != 0:
        return None
    return vals_t, lcols_t, epos_t, rblk, cblk, cspan, blk_list


def coo_sort_order(num_rows, rows, cols):
    """Stable (row, col) sort order for COO entries — counting sort by
    row + per-row stable column sort. Returns an int64 permutation, or
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    # the native counting sort indexes start[rows[e] + 1] unchecked, so
    # out-of-range / non-int32 values would corrupt memory rather than
    # raise — validate here and let callers fall back to lexsort
    if rows.size:
        if int(rows.min()) < 0 or int(rows.max()) >= int(num_rows):
            return None
        if int(cols.min()) < 0 or int(cols.max()) > np.iinfo(np.int32).max:
            return None
    if int(num_rows) > np.iinfo(np.int32).max:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    order = np.empty(rows.size, dtype=np.int64)
    lib.coo_sort_order(int(num_rows), int(rows.size), rows, cols, order)
    return order


def tri_levels(row_offsets, col_indices, num_rows, lower=True):
    """Dependency levels of a triangular CSR (level-scheduled solve
    setup) in one native O(nnz) walk. Returns (level int64 array,
    nlevels) or (None, None) when the library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "tri_levels"):
        return None, None
    ro = np.ascontiguousarray(row_offsets, dtype=np.int64)
    ci = np.ascontiguousarray(col_indices, dtype=np.int32)
    out = np.zeros(max(int(num_rows), 1), dtype=np.int32)
    nlev = lib.tri_levels(int(num_rows), ro, ci,
                          1 if lower else 0, out)
    return out[:num_rows].astype(np.int64), int(nlev)


def ell_jobs_per_rowblock(csr):
    """Per-128-row-block gather-job counts for the ELL planner in one
    native linear walk (replaces the sort-based estimate). Returns an
    (nrb,) int64 array, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ro, ci = _csr_buffers(csr)
    nrb = max(-(-csr.num_rows // 128), 1)
    out = np.zeros(nrb, dtype=np.int64)
    lib.ell_jobs_per_rowblock(csr.num_rows, csr.num_cols, ro, ci, out)
    return out


def ell_tiles_fill(csr, jobs_per_tile, tile_base, ntiles):
    """Native ELL gather-job payload fill. Returns (vals, local_cols,
    job_cblk) or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ro, ci = _csr_buffers(csr)
    va = np.ascontiguousarray(np.asarray(csr.values))
    J = int(jobs_per_tile)
    tb = np.ascontiguousarray(tile_base, dtype=np.int64)
    vals_t = np.zeros((ntiles, J, 128), dtype=va.dtype)
    lcols_t = np.zeros((ntiles, J, 128), dtype=np.int32)
    job_cblk = np.zeros(ntiles * J, dtype=np.int32)
    rc = lib.ell_tiles_fill(
        csr.num_rows, csr.num_cols, ro, ci,
        va.ctypes.data_as(ctypes.c_void_p),
        np.int32(va.dtype.itemsize), J, tb, int(ntiles),
        vals_t.ctypes.data_as(ctypes.c_void_p),
        lcols_t.reshape(-1), job_cblk,
    )
    if rc != 0:
        return None
    return vals_t, lcols_t, job_cblk


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
