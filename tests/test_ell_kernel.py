"""Layered-ELL format and SpMM kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.formats.ell import (
    build_ell_tiles,
    ell_occupancy_estimate,
    ell_to_dense,
)
from tpusparse.io import generators
from tpusparse.kernels import ell_spmm


def random_vals(csr, rng):
    v = np.asarray(csr.values)
    csr.values = rng.standard_normal(v.shape)
    return csr


class TestEllFormat:
    @pytest.mark.parametrize(
        "make",
        [
            lambda: generators.make_laplacian_grid2d(20).to_csr(),
            lambda: generators.make_laplacian_grid3d(7).to_csr(),
            lambda: generators.make_grid2d(17, self_loop=True).to_csr(),
        ],
    )
    def test_lossless(self, make, rng):
        csr = random_vals(make(), rng)
        t = build_ell_tiles(csr)
        np.testing.assert_allclose(ell_to_dense(t), csr.to_dense())

    def test_layering_long_rows(self, rng):
        csr = random_vals(generators.make_dense(30, 40).to_csr(), rng)
        t = build_ell_tiles(csr)  # 40 jobs/row-block, 16 per tile
        assert t.ntiles == 3
        np.testing.assert_allclose(ell_to_dense(t), csr.to_dense())

    def test_occupancy_estimate_matches(self):
        csr = generators.make_laplacian_grid3d(8).to_csr()
        t = build_ell_tiles(csr)
        est = ell_occupancy_estimate(csr)
        assert abs(est - t.occupancy) < 1e-9

    def test_wheel_skew_low_occupancy(self):
        csr = generators.make_wheel(2000).to_csr()
        assert ell_occupancy_estimate(csr) < 0.1  # triggers fallback


class TestEllKernel:
    @pytest.mark.parametrize("L", [1, 8, 32])
    def test_spmm_matches_scipy(self, L, rng):
        csr = random_vals(
            generators.make_laplacian_grid2d(20).to_csr(), rng
        )
        A = ell_spmm.to_device_ell(build_ell_tiles(csr))
        X = rng.standard_normal((csr.num_cols, L)).astype(np.float32)
        Y = np.asarray(ell_spmm.spmm_ell(A, jnp.asarray(X)))
        expect = csr.to_scipy().astype(np.float32) @ X
        scale = np.abs(expect).max() + 1.0
        np.testing.assert_allclose(Y / scale, expect / scale, atol=2e-5)

    def test_spmv_1d(self, rng):
        csr = random_vals(
            generators.make_laplacian_grid3d(6).to_csr(), rng
        )
        A = ell_spmm.to_device_ell(build_ell_tiles(csr))
        x = rng.standard_normal(csr.num_cols).astype(np.float32)
        y = np.asarray(ell_spmm.spmv_ell(A, jnp.asarray(x)))
        expect = csr.to_scipy().astype(np.float32) @ x
        scale = np.abs(expect).max() + 1.0
        np.testing.assert_allclose(y / scale, expect / scale, atol=2e-5)

    def test_multi_layer_accumulation(self, rng):
        # dense-ish rows -> several layers per row block
        csr = random_vals(
            generators.make_random_spd(400, row_nnz=30, seed=5,
                                       bandwidth=64).to_csr(), rng
        )
        A = ell_spmm.to_device_ell(build_ell_tiles(csr))
        assert A.ntiles > -(-csr.num_rows // 128)
        X = rng.standard_normal((csr.num_cols, 4)).astype(np.float32)
        Y = np.asarray(ell_spmm.spmm_ell(A, jnp.asarray(X)))
        expect = csr.to_scipy().astype(np.float32) @ X
        scale = np.abs(expect).max() + 1.0
        np.testing.assert_allclose(Y / scale, expect / scale, atol=2e-5)

    def test_empty_row_blocks(self, rng):
        from tpusparse.formats.coo import CooMatrix
        from tpusparse.formats.csr import CsrMatrix

        coo = CooMatrix(
            300, 300,
            np.array([0, 299], dtype=np.int32),
            np.array([5, 250], dtype=np.int32),
            np.array([2.0, 3.0]),
        )
        csr = CsrMatrix.from_coo(coo)
        A = ell_spmm.to_device_ell(build_ell_tiles(csr))
        x = np.ones(300, dtype=np.float32)
        y = np.asarray(ell_spmm.spmv_ell(A, jnp.asarray(x)))
        expect = np.zeros(300)
        expect[0], expect[299] = 2.0, 3.0
        np.testing.assert_allclose(y, expect, atol=1e-6)

    def test_alpha_beta(self, rng):
        csr = random_vals(
            generators.make_laplacian_grid2d(10).to_csr(), rng
        )
        A = ell_spmm.to_device_ell(build_ell_tiles(csr))
        X = rng.standard_normal((csr.num_cols, 4)).astype(np.float32)
        Y0 = rng.standard_normal((csr.num_rows, 4)).astype(np.float32)
        got = np.asarray(
            ell_spmm.spmm_ell(A, jnp.asarray(X), alpha=2.0, beta=-0.5,
                              Y=jnp.asarray(Y0))
        )
        expect = 2.0 * (csr.to_scipy().astype(np.float32) @ X) - 0.5 * Y0
        scale = np.abs(expect).max() + 1.0
        np.testing.assert_allclose(got / scale, expect / scale, atol=3e-5)

    def test_rhs_chunking(self, rng, monkeypatch):
        """RHS blocks beyond the VMEM budget split into lane chunks."""
        monkeypatch.setattr(ell_spmm, "X_VMEM_BUDGET_BYTES", 8 * 1024)
        csr = random_vals(
            generators.make_laplacian_grid2d(12).to_csr(), rng
        )
        A = ell_spmm.to_device_ell(build_ell_tiles(csr))
        X = rng.standard_normal((csr.num_cols, 24)).astype(np.float32)
        Y = np.asarray(ell_spmm.spmm_ell(A, jnp.asarray(X)))
        expect = csr.to_scipy().astype(np.float32) @ X
        scale = np.abs(expect).max() + 1.0
        np.testing.assert_allclose(Y / scale, expect / scale, atol=2e-5)


class TestCapacityLimits:
    def test_oversize_rhs_slab_raises(self):
        """A matrix whose minimum 8-lane RHS slab exceeds the
        scoped-vmem ceiling gets an actionable error, not a Mosaic
        compile failure (observed: lap3d-160, 4.1M cols)."""
        n = 4_000_000
        A = ell_spmm.DeviceEll(
            num_rows=n, num_cols=n, nnz=7 * n, jobs_per_tile=16,
            vals=None, local_cols=None, row_block=None,
            new_block=None, job_cblk=None,
        )
        # dtype comes from vals; fake it via a tiny array
        A.vals = jnp.zeros((1, 16, 128), jnp.float32)
        with pytest.raises(ValueError, match="scoped-vmem"):
            ell_spmm.spmm_ell(A, jnp.zeros((n, 8), jnp.float32))

    def test_df_oversize_rhs_slab_raises(self):
        from tpusparse.kernels import ell_df

        n = 2_000_000  # hi+lo doubling halves the df envelope
        A = ell_df.DeviceEllDF(
            num_rows=n, num_cols=n, nnz=7 * n, jobs_per_tile=8,
            vals_hi=None, vals_lo=None, local_cols=None,
            row_block=None, new_block=None, job_cblk=None,
        )
        with pytest.raises(ValueError, match="scoped-vmem"):
            ell_df.spmm_ell_df(A, jnp.zeros((n, 8), jnp.float64))

    def test_cblk_smem_block_layout(self):
        """The per-step cblk SMEM block must match the job stream's
        (tile, job) order — regression for the whole-array prefetch
        that overflowed the 1 MB SMEM at ntiles*J > 256k (lap3d-160).
        Exercised end-to-end on a matrix whose x blocks differ per
        job so a transposed reshape would mis-gather."""
        rng = np.random.default_rng(3)
        csr = random_vals(
            generators.make_laplacian_grid2d(40).to_csr(), rng
        )
        A = ell_spmm.to_device_ell(build_ell_tiles(csr))
        assert A.job_cblk.size == A.ntiles * A.jobs_per_tile
        X = rng.standard_normal((csr.num_cols, 8)).astype(np.float32)
        Y = np.asarray(ell_spmm.spmm_ell(A, jnp.asarray(X)))
        expect = csr.to_scipy().astype(np.float32) @ X
        scale = np.abs(expect).max() + 1.0
        np.testing.assert_allclose(Y / scale, expect / scale,
                                   atol=2e-5)
