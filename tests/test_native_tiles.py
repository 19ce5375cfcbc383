"""Native merge-tile partitioner parity (native/src/merge_tiles.cpp).

The native builder must be BIT-IDENTICAL to the numpy builder in
formats/tiles.py — same tile order (row windows ascending, clusters by
first touched block, cells in block order), same payloads. Reference
capability: the load-time merge-path search (SURVEY §2.2,
dispatch_spmv_orig.cuh:104) whose cost the reference pays in a native
search kernel; ours is a native host partitioner.
"""

import os

import numpy as np
import pytest

from tpusparse.formats import tiles as TT
from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.io import generators
from tpusparse.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

FIELDS = ("vals", "local_cols", "end_pos", "row_block", "col_block",
          "col_span")


def _rand_csr(rng, m, n, density):
    nnz = int(m * n * density)
    r = rng.integers(0, m, nnz)
    c = rng.integers(0, n, nnz)
    # dedupe coordinates: with duplicates both builders are correct but
    # order tied values differently (stable counting sort vs unstable
    # introsort), so exact-equality comparison needs unique coords
    key = np.unique(r.astype(np.int64) * n + c)
    r, c = key // n, key % n
    v = rng.standard_normal(r.size)
    return CsrMatrix.from_coo(CooMatrix(m, n, r, c, v))


def _both(csr, T, wr, wc):
    os.environ["TPUSPARSE_NO_NATIVE"] = "1"
    try:
        a = TT.build_merge_tiles(csr, tile_nnz=T, row_window=wr,
                                 col_window=wc)
    finally:
        os.environ.pop("TPUSPARSE_NO_NATIVE", None)
    b = TT.build_merge_tiles(csr, tile_nnz=T, row_window=wr,
                             col_window=wc)
    return a, b


@pytest.mark.parametrize(
    "make,wr,wc",
    [
        (lambda: generators.make_laplacian_grid2d(24).to_csr(), 256, 1024),
        (lambda: generators.make_laplacian_grid3d(16).to_csr(), 1024, 2048),
        (lambda: generators.make_wheel(3000).to_csr(), 512, 4096),
        (lambda: generators.make_dense(96, 80).to_csr(), 256, 1024),
    ],
)
def test_native_parity_fixtures(make, wr, wc):
    a, b = _both(make(), 1024, wr, wc)
    assert a.ntiles == b.ntiles
    for f in FIELDS:
        np.testing.assert_array_equal(
            getattr(a, f), getattr(b, f), err_msg=f
        )


def test_native_parity_random_shapes(rng):
    for m, n, d in [(2000, 1500, 0.004), (500, 4000, 0.01),
                    (5000, 5000, 0.0008), (300, 300, 0.05)]:
        csr = _rand_csr(rng, m, n, d)
        a, b = _both(csr, 1024, 256, 2048)
        for f in FIELDS:
            np.testing.assert_array_equal(
                getattr(a, f), getattr(b, f), err_msg=f"{f} at {m}x{n}"
            )


def test_native_parity_fp64_and_empty_rows(rng):
    # fp64 values exercise the elsize=8 memcpy path; empty leading /
    # trailing rows exercise window skipping
    m = 700
    r = np.concatenate([rng.integers(100, 600, 3000)])
    c = np.concatenate([rng.integers(0, 700, 3000)])
    key = np.unique(r.astype(np.int64) * m + c)
    r, c = key // m, key % m
    v = rng.standard_normal(r.size).astype(np.float64)
    csr = CsrMatrix.from_coo(CooMatrix(m, m, r, c, v))
    a, b = _both(csr, 1024, 256, 1024)
    for f in FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f)
    assert a.vals.dtype == np.float64


def test_native_tiling_counts_match_efficiency(rng):
    csr = generators.make_laplacian_grid3d(12).to_csr()
    wrs, wcs = (256, 512, 1024), (1024, 2048)
    counts = native.merge_tiling_counts(csr, 1024, wrs, wcs)
    assert counts is not None
    for i, wr in enumerate(wrs):
        for j, wc in enumerate(wcs):
            occ = TT.tiling_efficiency(csr, 1024, wr, wc)
            occ_native = csr.nnz / (int(counts[i, j]) * 1024)
            assert occ == pytest.approx(occ_native), (wr, wc)


ELL_FIELDS = ("vals", "local_cols", "row_block", "new_block",
              "job_cblk")


def _both_ell(csr, J):
    from tpusparse.formats import ell

    os.environ["TPUSPARSE_NO_NATIVE"] = "1"
    try:
        a = ell.build_ell_tiles(csr, jobs_per_tile=J)
    finally:
        os.environ.pop("TPUSPARSE_NO_NATIVE", None)
    b = ell.build_ell_tiles(csr, jobs_per_tile=J)
    return a, b


@pytest.mark.parametrize("J", [8, 16])
def test_native_ell_parity_fixtures(J, rng):
    mats = [
        generators.make_laplacian_grid2d(24).to_csr(),
        generators.make_laplacian_grid3d(12).to_csr(),
        generators.make_wheel(3000).to_csr(),
        _rand_csr(rng, 900, 700, 0.01),
    ]
    for csr in mats:
        a, b = _both_ell(csr, J)
        assert a.ntiles == b.ntiles
        for f in ELL_FIELDS:
            np.testing.assert_array_equal(
                getattr(a, f), getattr(b, f), err_msg=f
            )


def test_native_ell_jobs_per_rowblock(rng):
    from tpusparse.formats import ell

    csr = generators.make_laplacian_grid3d(10).to_csr()
    jr = native.ell_jobs_per_rowblock(csr)
    os.environ["TPUSPARSE_NO_NATIVE"] = "1"
    try:
        jr_py = ell._jobs_per_rowblock(csr)
    finally:
        os.environ.pop("TPUSPARSE_NO_NATIVE", None)
    np.testing.assert_array_equal(jr, jr_py)


def test_native_coo_sort_order_stable_parity(rng):
    """coo_sort_order must match numpy's stable lexsort exactly,
    including the order of duplicate coordinates."""
    n, nnz = 500, 6000
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    order = native.coo_sort_order(n, r, c)
    assert order is not None
    np.testing.assert_array_equal(order, np.lexsort((c, r)))


def test_native_duplicate_coords_same_matrix(rng):
    """With duplicate coordinates the partitions may order tied values
    differently but must reconstruct the same dense matrix."""
    m = 400
    r = rng.integers(0, m, 2000)
    c = rng.integers(0, m, 2000)
    v = rng.standard_normal(2000)
    csr = CsrMatrix.from_coo(CooMatrix(m, m, r, c, v))
    a, b = _both(csr, 1024, 256, 1024)
    np.testing.assert_allclose(
        TT.tiles_to_dense(a), TT.tiles_to_dense(b), rtol=0, atol=0
    )
