"""Merge-tile Pallas SpMV kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.tiles import build_merge_tiles
from tpusparse.io import generators
from tpusparse.kernels import merge_spmv


def run_case(csr, rng, **tile_kwargs):
    tiles = build_merge_tiles(csr, tile_nnz=1024, **tile_kwargs)
    A = merge_spmv.to_device_tiles(tiles, dtype=np.float32)
    x = rng.standard_normal(csr.num_cols).astype(np.float32)
    y = np.asarray(merge_spmv.spmv_merge(A, jnp.asarray(x)))
    expect = csr.to_scipy().astype(np.float32) @ x
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(y / scale, expect / scale, atol=2e-5)
    return tiles


@pytest.mark.parametrize(
    "make",
    [
        lambda: generators.make_laplacian_grid2d(24).to_csr(),
        lambda: generators.make_laplacian_grid3d(8).to_csr(),
        lambda: generators.make_grid2d(20, self_loop=True).to_csr(),
        lambda: generators.make_dense(50, 60).to_csr(),
    ],
)
def test_banded_matrices_no_overflow(make, rng):
    tiles = run_case(make(), rng)
    assert tiles.overflow_fraction == 0.0


def test_wheel_skew(rng):
    # hub row with 3000 nonzeros: exercises long-row splitting and the
    # merge-path load-balance guarantee
    csr = generators.make_wheel(3000).to_csr()
    run_case(csr, rng)


def test_random_scattered_columns(rng):
    coo_rows = rng.integers(0, 500, 4000).astype(np.int32)
    coo_cols = rng.integers(0, 5000, 4000).astype(np.int32)
    vals = rng.standard_normal(4000)
    csr = CsrMatrix.from_coo(
        CooMatrix(500, 5000, coo_rows, coo_cols, vals), sum_dups=True
    )
    tiles = run_case(csr, rng, col_window=1024)
    assert tiles.overflow_nnz == 0  # bucketed partition is total


def test_empty_rows_and_tail(rng):
    # rows 1..3 empty; num_rows not a multiple of 128
    coo = CooMatrix(
        131, 131,
        np.array([0, 4, 130], dtype=np.int32),
        np.array([1, 2, 130], dtype=np.int32),
        np.array([1.0, 2.0, 3.0]),
    )
    run_case(CsrMatrix.from_coo(coo), rng)


def test_multiple_tiles_per_row_block(rng):
    # dense-ish band: forces several tiles sharing a row window, carries
    # accumulate across tiles through the combine kernel
    csr = generators.make_random_spd(
        2000, row_nnz=40, seed=7, bandwidth=100
    ).to_csr()
    run_case(csr, rng)


def test_bigger_than_one_grid_step(rng):
    # > TILES_PER_STEP tiles
    csr = generators.make_laplacian_grid2d(64).to_csr()  # 4096 rows, 20k nnz
    tiles = run_case(csr, rng)
    assert tiles.ntiles > merge_spmv.TILES_PER_STEP


def test_span_classed_plan_correct(rng):
    """A 3-D Laplacian big enough to class-split (dense-band tiles
    span 2-3 slices, far-diagonal tiles span the window): every class
    runs its own kernel and the summed result matches the oracle."""
    csr = generators.make_laplacian_grid3d(26).to_csr()  # 136 tiles
    tiles = build_merge_tiles(csr, tile_nnz=1024, row_window=1024,
                              col_window=2048)
    A = merge_spmv.to_device_tiles(tiles, dtype=np.float32)
    assert isinstance(A, merge_spmv.ClassedTiles)
    spans = [p.row_span for p in A.plans]
    assert len(set(spans)) == len(spans)  # distinct static spans
    x = rng.standard_normal(csr.num_cols).astype(np.float32)
    y = np.asarray(merge_spmv.spmv_merge(A, jnp.asarray(x)))
    expect = csr.to_scipy().astype(np.float32) @ x
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(y / scale, expect / scale, atol=2e-5)
    # forcing one class gives the same result
    A1 = merge_spmv.to_device_tiles(tiles, dtype=np.float32,
                                    span_classes=1)
    assert not isinstance(A1, merge_spmv.ClassedTiles)
    y1 = np.asarray(merge_spmv.spmv_merge(A1, jnp.asarray(x)))
    np.testing.assert_allclose(y / scale, y1 / scale, atol=2e-5)


def test_wide_row_window_uses_per_window_extraction(rng):
    """A tile of 1024 one-per-row entries starting mid-slice spans 9
    row slices — beyond the batched fast path's Mosaic bound of 8 —
    and must route through the per-window extraction loop."""
    # rows 0..63 form cluster A; rows 64..1087 put exactly one entry
    # each in a distant column cluster, making ONE 1024-entry tile
    # whose rows cross 9 slice boundaries (64..1087)
    rows = np.concatenate([np.arange(64), np.arange(64, 1088)])
    cols = np.concatenate([np.zeros(64, np.int64),
                           np.full(1024, 2000, np.int64)])
    coo = CooMatrix(2048, 2048, rows, cols,
                    rng.standard_normal(rows.size))
    csr = CsrMatrix.from_coo(coo)
    tiles = run_case(csr, rng, row_window=2048, col_window=4096)
    from tpusparse.kernels.merge_spmv import _tile_row_anchors

    _, span = _tile_row_anchors(tiles)
    assert int(span.max()) == 9  # the fixture exercises wrb > 8
