"""Merge-tile SpMM tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.formats.tiles import build_merge_tiles
from tpusparse.io import generators
from tpusparse.kernels import merge_spmv, spmm_tiles


@pytest.mark.parametrize("L", [1, 4, 16])
def test_spmm_merge_matches_scipy(L, rng):
    csr = generators.make_laplacian_grid2d(20).to_csr()
    tiles = build_merge_tiles(csr)
    A = merge_spmv.to_device_tiles(tiles, dtype=np.float32)
    X = rng.standard_normal((csr.num_cols, L)).astype(np.float32)
    Y = np.asarray(spmm_tiles.spmm_merge(A, jnp.asarray(X)))
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
        spmm_tiles.spmm_merge(A, jnp.asarray(X), alpha=2.0, beta=-0.5,
                              Y=jnp.asarray(Y0))
    )
    expect = 2.0 * (csr.to_scipy().astype(np.float32) @ X) - 0.5 * Y0
    scale = np.abs(expect).max() + 1.0
    np.testing.assert_allclose(got / scale, expect / scale, atol=2e-5)


class TestBsr:
    def test_bsr_spmv(self, rng):
        from tpusparse.formats.bcsr import BcsrMatrix

        csr = generators.make_laplacian_grid2d(16).to_csr()
        b = BcsrMatrix.from_csr(csr, 8, 16).to_device()
        from tpusparse.kernels import bsr

        x = rng.standard_normal(csr.num_cols)
        y = np.asarray(bsr.bsr_spmv(b, jnp.asarray(x)))
        np.testing.assert_allclose(y, csr.to_scipy() @ x, rtol=1e-12)

    def test_bsr_spmm(self, rng):
        from tpusparse.formats.bcsr import BcsrMatrix

        csr = generators.make_laplacian_grid2d(12).to_csr()
        b = BcsrMatrix.from_csr(csr, 4, 8).to_device()
        from tpusparse.kernels import bsr

        X = rng.standard_normal((csr.num_cols, 8))
        Y = np.asarray(bsr.bsr_spmm(b, jnp.asarray(X)))
        np.testing.assert_allclose(Y, csr.to_scipy() @ X, rtol=1e-12)
