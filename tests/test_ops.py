"""SpMV/SpMM reference-op tests vs scipy, and BLAS-1 op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.io import generators
from tpusparse.ops import blas
from tpusparse.ops import reference as ref
from tpusparse.ops.spmv import spmv, spmm, SpmvStrategy


def cases():
    return [
        ("grid2d", generators.make_grid2d(12).to_csr()),
        ("wheel", generators.make_wheel(300).to_csr()),
        ("dense", generators.make_dense(20, 30).to_csr()),
        ("spd", generators.make_random_spd(150, row_nnz=8).to_csr()),
        ("lap3d", generators.make_laplacian_grid3d(6).to_csr()),
    ]


@pytest.mark.parametrize("name,csr", cases())
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_spmv_reference_vs_scipy(name, csr, dtype, rng):
    x = rng.standard_normal(csr.num_cols).astype(dtype)
    d = csr.to_device(dtype=dtype)
    y = np.asarray(ref.spmv_reference(d, jnp.asarray(x)))
    expect = csr.to_scipy().astype(dtype) @ x
    tol = 1e-5 if dtype == np.float32 else 1e-12
    np.testing.assert_allclose(y, expect, rtol=tol, atol=tol)


@pytest.mark.parametrize("name,csr", cases()[:3])
def test_spmv_alpha_beta(name, csr, rng):
    x = rng.standard_normal(csr.num_cols)
    y0 = rng.standard_normal(csr.num_rows)
    d = csr.to_device()
    got = np.asarray(
        ref.spmv_reference(d, jnp.asarray(x), alpha=2.5, beta=-0.5,
                           y=jnp.asarray(y0))
    )
    expect = 2.5 * (csr.to_scipy() @ x) - 0.5 * y0
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("L", [1, 8, 32])
def test_spmm_reference_vs_scipy(L, rng):
    csr = generators.make_laplacian_grid2d(10).to_csr()
    X = rng.standard_normal((csr.num_cols, L))
    d = csr.to_device()
    got = np.asarray(ref.spmm_reference(d, jnp.asarray(X)))
    expect = csr.to_scipy() @ X
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)


def test_spmv_numpy_oracle(rng):
    csr = generators.make_grid2d(10).to_csr()
    x = rng.standard_normal(csr.num_cols)
    np.testing.assert_allclose(
        ref.spmv_numpy(csr, x), csr.to_scipy() @ x, rtol=1e-13
    )


def test_spmv_public_dispatch(rng):
    csr = generators.make_grid2d(8).to_csr()
    x = rng.standard_normal(csr.num_cols)
    got = np.asarray(spmv(csr.to_device(), jnp.asarray(x)))
    np.testing.assert_allclose(got, csr.to_scipy() @ x, rtol=1e-12)


def test_strategy_aliases():
    # reference driver kernel names map onto their TPU analogues
    assert SpmvStrategy.parse("simple") == SpmvStrategy.ROW_SPLIT
    # round 4: NONZERO_SPLIT is its own plan family (pure equal-nnz
    # partition), no longer an alias of MERGE
    assert (SpmvStrategy.parse("nonzero_split")
            == SpmvStrategy.NONZERO_SPLIT)
    assert SpmvStrategy.parse("merge") == SpmvStrategy.MERGE
    # the vendor baseline is BCOO, not an alias of reference
    assert SpmvStrategy.parse("mkl") == SpmvStrategy.BCOO
    assert SpmvStrategy.parse(SpmvStrategy.BSR) == SpmvStrategy.BSR


def test_plan_matrix_auto(rng):
    from tpusparse.ops.spmv import plan_matrix
    from tpusparse.kernels.ell_spmm import DeviceEll
    from tpusparse.kernels.merge_spmv import DeviceTiles

    from tpusparse.ops.hybrid import HybridPlan

    # regular stencil -> pure DIA (entirely diagonal) for any L/dtype
    csr = generators.make_laplacian_grid2d(16).to_csr()
    A = plan_matrix(csr, dtype=np.float32, L=16)
    assert isinstance(A, HybridPlan) and A.rest is None
    A1 = plan_matrix(csr, dtype=np.float32, L=1)
    assert isinstance(A1, HybridPlan) and A1.rest is None
    # skewed wheel: ring diagonals peel to DIA, hub/spokes -> merge
    wheel = generators.make_wheel(2000).to_csr()
    A2 = plan_matrix(wheel, dtype=np.float32, L=16)
    assert isinstance(A2, HybridPlan)
    assert isinstance(A2.rest, DeviceTiles)
    # fp64 stencil -> native-f64 DIA planes
    A3 = plan_matrix(csr, dtype=np.float64)
    assert isinstance(A3, HybridPlan) and A3.rest is None
    assert A3.dia.data.dtype == np.float64
    # the non-DIA fp64 single-RHS path routes to the double-float
    # MERGE kernel (skew-insensitive, 21x the df-ELL kernel on R-MAT);
    # fp64 multi-RHS keeps the lane-filling df gather-job kernel
    from tpusparse.kernels.ell_df import DeviceEllDF
    from tpusparse.kernels.merge_df import DfMergeTiles

    A3b = plan_matrix(csr, dtype=np.float64, _allow_dia=False)
    assert isinstance(A3b, DfMergeTiles)
    A3c = plan_matrix(csr, dtype=np.float64, L=8, _allow_dia=False)
    assert isinstance(A3c, DeviceEllDF)
    # fp64 wheel: DIA ring peeled; the hub/spoke remainder rides the
    # skew-insensitive df merge kernel
    A4 = plan_matrix(wheel, dtype=np.float64)
    assert isinstance(A4, HybridPlan)
    assert A4.rest is not None
    # multi-RHS non-DIA fp32 stencil path -> gather-job ELL
    Ae = plan_matrix(csr, dtype=np.float32, L=16, _allow_dia=False)
    assert isinstance(Ae, DeviceEll)
    # pathological packing (one entry per 128-slot job) -> reference
    from tpusparse.formats.coo import CooMatrix

    n = 40000
    diagish = CooMatrix(
        n, n, np.arange(n), (np.arange(n) * 131) % n,
        np.ones(n),
    )
    # scattered fp64 single-RHS: the df merge kernel takes it (the old
    # df-ELL occupancy fallback to reference no longer applies at L=1)
    A5 = plan_matrix(CsrMatrix.from_coo(diagish), dtype=np.float64)
    assert isinstance(A5, DfMergeTiles)


def test_empty_rows_produce_zeros():
    coo = CooMatrix(4, 4, np.array([0, 3]), np.array([1, 2]),
                    np.array([1.0, 2.0]))
    d = CsrMatrix.from_coo(coo).to_device()
    y = np.asarray(ref.spmv_reference(d, jnp.ones(4)))
    np.testing.assert_allclose(y, [1.0, 0.0, 0.0, 2.0])


def test_jit_and_grad():
    csr = generators.make_laplacian_grid2d(6).to_csr()
    d = csr.to_device()
    x = jnp.ones(csr.num_cols, dtype=jnp.float64)

    f = jax.jit(lambda x: jnp.sum(ref.spmv_reference(d, x) ** 2))
    g = jax.grad(f)(x)
    # grad of ||Ax||^2 = 2 A^T A x
    A = csr.to_dense()
    np.testing.assert_allclose(
        np.asarray(g), 2 * A.T @ (A @ np.ones(csr.num_cols)), rtol=1e-10
    )


class TestBlas:
    def test_dot_multiple(self, rng):
        a = rng.standard_normal((50, 4))
        b = rng.standard_normal((50, 4))
        got = np.asarray(blas.dot_multiple(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, (a * b).sum(0), rtol=1e-12)

    def test_axpy_multiple(self, rng):
        y = rng.standard_normal((50, 4))
        x = rng.standard_normal((50, 4))
        al = rng.standard_normal(4)
        got = np.asarray(
            blas.axpy_multiple(jnp.asarray(y), jnp.asarray(al), jnp.asarray(x))
        )
        np.testing.assert_allclose(got, y + al[None, :] * x, rtol=1e-12)

    def test_update_p_multiple(self, rng):
        r = rng.standard_normal((50, 4))
        p = rng.standard_normal((50, 4))
        be = rng.standard_normal(4)
        got = np.asarray(
            blas.update_p_multiple(jnp.asarray(r), jnp.asarray(be),
                                   jnp.asarray(p))
        )
        np.testing.assert_allclose(got, r + be[None, :] * p, rtol=1e-12)
