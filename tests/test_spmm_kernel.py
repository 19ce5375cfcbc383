"""Merge-tile SpMM tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.formats.tiles import build_merge_tiles
from tpusparse.io import generators
from tpusparse.kernels import merge_spmv, spmm_merge


@pytest.mark.parametrize("L", [1, 4, 16])
def test_spmm_merge_matches_scipy(L, rng):
    csr = generators.make_laplacian_grid2d(20).to_csr()
    tiles = build_merge_tiles(csr)
    A = merge_spmv.to_device_tiles(tiles, dtype=np.float32)
    X = rng.standard_normal((csr.num_cols, L)).astype(np.float32)
    Y = np.asarray(spmm_merge.spmm_merge(A, jnp.asarray(X)))
    expect = csr.to_scipy().astype(np.float32) @ X
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(Y / scale, expect / scale, atol=2e-5)


def test_spmm_merge_alpha_beta(rng):
    csr = generators.make_laplacian_grid2d(12).to_csr()
    tiles = build_merge_tiles(csr)
    A = merge_spmv.to_device_tiles(tiles, dtype=np.float32)
    X = rng.standard_normal((csr.num_cols, 4)).astype(np.float32)
    Y0 = rng.standard_normal((csr.num_rows, 4)).astype(np.float32)
    got = np.asarray(
        spmm_merge.spmm_merge(A, jnp.asarray(X), alpha=2.0, beta=-0.5,
                              Y=jnp.asarray(Y0))
    )
    expect = 2.0 * (csr.to_scipy().astype(np.float32) @ X) - 0.5 * Y0
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(got / scale, expect / scale, atol=2e-5)


@pytest.mark.slow
def test_spmm_merge_wheel_skew(rng):
    """Row-length skew (the reference's wheel stress test,
    sparse_matrix.h:417-450): the hub row spans many column blocks; the
    in-kernel multi-RHS path must stay exact."""
    csr = generators.make_wheel(3000, dtype=np.float64).to_csr()
    csr = csr.astype(np.float32)
    tiles = build_merge_tiles(csr)
    A = merge_spmv.to_device_tiles(tiles, dtype=np.float32)
    X = rng.standard_normal((csr.num_cols, 16)).astype(np.float32)
    Y = np.asarray(spmm_merge.spmm_merge(A, jnp.asarray(X)))
    expect = csr.to_scipy().astype(np.float32) @ X
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(Y / scale, expect / scale, atol=5e-5)


@pytest.mark.slow
def test_spmm_merge_scattered_columns(rng):
    """Uniformly scattered columns (where ELL occupancy gating rejects
    the matrix and AUTO falls back to merge tiles)."""
    from tpusparse.formats.ell import ell_occupancy_estimate
    from tpusparse.ops.spmv import plan_matrix, spmm

    csr = generators.make_random_spd(2000, row_nnz=10,
                                     dtype=np.float64).to_csr()
    csr32 = csr.astype(np.float32)
    assert ell_occupancy_estimate(csr32) < 0.35
    A = plan_matrix(csr32, dtype=np.float32, L=32)
    assert isinstance(A, merge_spmv.DeviceTiles)  # AUTO fell back
    X = rng.standard_normal((csr.num_cols, 32)).astype(np.float32)
    Y = np.asarray(spmm(A, jnp.asarray(X)))
    expect = csr.to_scipy().astype(np.float32) @ X
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(Y / scale, expect / scale, atol=5e-5)


def test_spmm_merge_lane_rounding(rng):
    """L=12 pads to 16 lanes (Mosaic sublane constraint)."""
    csr = generators.make_laplacian_grid2d(12).to_csr()
    A = merge_spmv.to_device_tiles(build_merge_tiles(csr),
                                   dtype=np.float32)
    X = rng.standard_normal((csr.num_cols, 12)).astype(np.float32)
    Y = np.asarray(spmm_merge.spmm_merge(A, jnp.asarray(X)))
    expect = csr.to_scipy().astype(np.float32) @ X
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(Y / scale, expect / scale, atol=2e-5)


def test_spmm_merge_lane_chunking(rng, monkeypatch):
    """RHS wider than the VMEM budget lane-chunks and stays exact."""
    from tpusparse.kernels import ell_spmm

    csr = generators.make_laplacian_grid2d(12).to_csr()
    A = merge_spmv.to_device_tiles(build_merge_tiles(csr),
                                   dtype=np.float32)
    ncb = -(-A.num_cols // 128) + A.x_pad_rows
    mb = -(-A.num_rows // 128) + A.row_window // 128
    monkeypatch.setattr(ell_spmm, "X_VMEM_BUDGET_BYTES",
                        (ncb + mb) * 128 * 4 * 8)
    X = rng.standard_normal((csr.num_cols, 32)).astype(np.float32)
    Y = np.asarray(spmm_merge.spmm_merge(A, jnp.asarray(X)))
    expect = csr.to_scipy().astype(np.float32) @ X
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(Y / scale, expect / scale, atol=2e-5)


class TestBsrPallas:
    def test_panel_kernel_matches_scipy(self, rng):
        from tpusparse.formats.bcsr import BcsrMatrix
        from tpusparse.kernels import bsr

        csr = generators.make_block_random(
            8, 3, dtype=np.float64).to_csr().astype(np.float32)
        b = BcsrMatrix.from_csr(csr, 8, 128).to_device()
        assert bsr._tileable(b)
        X = rng.standard_normal((csr.num_cols, 16)).astype(np.float32)
        Y = np.asarray(bsr.bsr_spmm(b, jnp.asarray(X)))
        expect = csr.to_scipy() @ X
        scale = np.abs(expect).max() + 1.0
        np.testing.assert_allclose(Y / scale, expect / scale, atol=5e-5)

    def test_panel_kernel_spmv(self, rng):
        from tpusparse.formats.bcsr import BcsrMatrix
        from tpusparse.kernels import bsr

        csr = generators.make_block_random(
            6, 2, dtype=np.float64).to_csr().astype(np.float32)
        b = BcsrMatrix.from_csr(csr, 8, 128).to_device()
        x = rng.standard_normal(csr.num_cols).astype(np.float32)
        y = np.asarray(bsr.bsr_spmv(b, jnp.asarray(x)))
        expect = csr.to_scipy() @ x
        scale = np.abs(expect).max() + 1.0
        np.testing.assert_allclose(y / scale, expect / scale, atol=5e-5)

    def test_auto_gates_on_fill(self):
        from tpusparse.formats.bcsr import BcsrMatrix, fill_estimate
        from tpusparse.ops.spmv import plan_matrix

        blocky = generators.make_block_random(
            8, 3, dtype=np.float64).to_csr().astype(np.float32)
        assert fill_estimate(blocky, 8, 128) >= 0.3
        A = plan_matrix(blocky, dtype=np.float32, L=16)
        assert isinstance(A, BcsrMatrix)

        stencil = generators.make_laplacian_grid2d(16).to_csr()
        assert fill_estimate(stencil, 8, 128) < 0.3
        A2 = plan_matrix(stencil, dtype=np.float32, L=16)
        assert not isinstance(A2, BcsrMatrix)


class TestBsr:
    def test_bsr_spmv(self, rng):
        from tpusparse.formats.bcsr import BcsrMatrix

        csr = generators.make_laplacian_grid2d(16).to_csr()
        b = BcsrMatrix.from_csr(csr, 8, 16).to_device()
        from tpusparse.kernels import bsr

        x = rng.standard_normal(csr.num_cols)
        y = np.asarray(bsr.bsr_spmv(b, jnp.asarray(x)))
        # real-TPU fp64 accumulates in a different order than scipy
        # (observed 3.4e-11 rel on 1/256 elements); 1e-9 is still
        # firmly fp64-class
        np.testing.assert_allclose(y, csr.to_scipy() @ x, rtol=1e-9)

    def test_bsr_spmm(self, rng):
        from tpusparse.formats.bcsr import BcsrMatrix

        csr = generators.make_laplacian_grid2d(12).to_csr()
        b = BcsrMatrix.from_csr(csr, 4, 8).to_device()
        from tpusparse.kernels import bsr

        X = rng.standard_normal((csr.num_cols, 8))
        Y = np.asarray(bsr.bsr_spmm(b, jnp.asarray(X)))
        np.testing.assert_allclose(Y, csr.to_scipy() @ X, rtol=1e-9)
