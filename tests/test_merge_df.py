"""Double-float merge-tile SpMV (kernels/merge_df.py).

Parity oracle: scipy.sparse at fp64 (the reference's SpmvGold in its
default fp64 mode, cpu_spmv.cpp:979-986). Accuracy bar 1e-12 relative
(BASELINE target); the kernel measures ~1e-14. CPU runs use interpret
mode with the jnp.roll scan path.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from tpusparse.formats.csr import CsrMatrix
from tpusparse.formats.tiles import build_merge_tiles, choose_tiling
from tpusparse.io import generators
from tpusparse.kernels.merge_df import (
    DfMergeTiles,
    spmm_merge_df,
    spmv_merge_df,
    to_device_tiles_df,
)
from tpusparse.ops.spmv import plan_matrix, spmv


def _plan(csr, **kwargs):
    wr, wc = choose_tiling(csr)
    return to_device_tiles_df(
        build_merge_tiles(csr, row_window=wr, col_window=wc), **kwargs
    )


def _check(csr, rng, tol=1e-12):
    import jax.numpy as jnp

    plan = _plan(csr)
    S = csr.to_scipy()
    x = rng.standard_normal(csr.num_cols)
    y = np.asarray(spmv_merge_df(plan, jnp.asarray(x)))
    ref = S @ x
    scale = np.abs(ref).max() + 1e-300
    assert np.abs(y - ref).max() / scale < tol
    return plan


@pytest.mark.parametrize("maker", [
    lambda: CsrMatrix.from_scipy(
        sp.random(2500, 2500, density=0.002, random_state=1,
                  format="csr").astype(np.float64)),
    lambda: generators.make_laplacian_grid3d(14, dtype=np.float64
                                             ).to_csr(),
    lambda: generators.make_wheel(4000, dtype=np.float64).to_csr(),
    lambda: generators.make_rmat(10, dtype=np.float64).to_csr(),
])
@pytest.mark.slow
def test_df_merge_parity(maker, rng):
    _check(maker(), rng)


@pytest.mark.slow
def test_df_merge_alpha_beta(rng):
    import jax.numpy as jnp

    csr = generators.make_laplacian_grid2d(20, dtype=np.float64
                                           ).to_csr()
    plan = _plan(csr)
    S = csr.to_scipy()
    x = rng.standard_normal(csr.num_cols)
    y0 = rng.standard_normal(csr.num_rows)
    got = np.asarray(spmv_merge_df(plan, jnp.asarray(x), alpha=2.5,
                                   beta=-0.5, y=jnp.asarray(y0)))
    want = 2.5 * (S @ x) - 0.5 * y0
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12
    X = rng.standard_normal((csr.num_cols, 3))
    Y = np.asarray(spmm_merge_df(plan, jnp.asarray(X)))
    refM = S @ X
    assert np.abs(Y - refM).max() / np.abs(refM).max() < 1e-12


def test_fp64_auto_routes_merge_df(rng):
    # scattered fp64 single-RHS -> df merge (skew-insensitive); the
    # explicit 'merge' strategy at fp64 does too
    R = sp.random(2000, 2000, density=0.003, random_state=2,
                  format="csr").astype(np.float64)
    csr = CsrMatrix.from_scipy(R)
    A = plan_matrix(csr, dtype=np.float64)
    assert isinstance(A, DfMergeTiles)
    Am = plan_matrix(csr, strategy="merge", dtype=np.float64)
    assert isinstance(Am, DfMergeTiles)
    x = rng.standard_normal(2000)
    y = np.asarray(spmv(A, x))
    ref = R @ x
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-12


@pytest.mark.parametrize("maker,L", [
    (lambda: generators.make_wheel(4000, dtype=np.float64).to_csr(), 16),
    (lambda: generators.make_rmat(10, dtype=np.float64).to_csr(), 12),
])
@pytest.mark.slow
def test_df_spmm_multi_rhs_skew(maker, L, rng):
    # the in-kernel multi-RHS df merge SpMM (one payload stream,
    # (L,128) lane gathers, Hillis-Steele df scan) on the skewed
    # fixtures where df-ELL's job count explodes; L=12 exercises the
    # 8-lane pad
    import jax.numpy as jnp

    csr = maker()
    plan = _plan(csr)
    S = csr.to_scipy()
    X = rng.standard_normal((csr.num_cols, L))
    Y = np.asarray(spmm_merge_df(plan, jnp.asarray(X)))
    ref = S @ X
    assert Y.shape == ref.shape
    assert np.abs(Y - ref).max() / np.abs(ref).max() < 1e-12


def test_fp64_auto_multi_rhs_routing():
    from tpusparse.formats.ell import ell_occupancy_estimate
    from tpusparse.kernels.ell_df import DF_JOBS_PER_TILE, DeviceEllDF
    from tpusparse.ops.spmv import DF_ELL_MIN_OCC

    # stencil: df-ELL packing holds -> gather-job plan (_allow_dia off
    # to isolate the occupancy gate — full AUTO peels the stencil's
    # diagonals first)
    lap = generators.make_laplacian_grid3d(12, dtype=np.float64
                                           ).to_csr()
    assert ell_occupancy_estimate(lap, DF_JOBS_PER_TILE) \
        >= DF_ELL_MIN_OCC
    assert isinstance(plan_matrix(lap, dtype=np.float64, L=16,
                                  _allow_dia=False),
                      DeviceEllDF)
    # power-law skew: job count explodes -> the df merge SpMM plan
    rm = generators.make_rmat(10, dtype=np.float64).to_csr()
    assert ell_occupancy_estimate(rm, DF_JOBS_PER_TILE) \
        < DF_ELL_MIN_OCC
    assert isinstance(plan_matrix(rm, dtype=np.float64, L=16),
                      DfMergeTiles)


def test_fp64_cg_iteration_parity_via_merge_df(rng):
    import jax.numpy as jnp

    from tpusparse.solvers.cg import cg_solve

    csr = generators.make_laplacian_grid2d(20, dtype=np.float64
                                           ).to_csr()
    A_df = plan_matrix(csr, strategy="merge", dtype=np.float64)
    assert isinstance(A_df, DfMergeTiles)
    b = jnp.asarray(rng.standard_normal(csr.num_rows))
    res = cg_solve(A_df, b, max_iters=2000, tolerance=1e-10)
    A_ref = plan_matrix(csr, strategy="reference", dtype=np.float64)
    ref = cg_solve(A_ref, b, max_iters=2000, tolerance=1e-10)
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-8)
