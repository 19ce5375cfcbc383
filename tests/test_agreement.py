"""Cross-implementation agreement — the reference's core test pattern
(SURVEY §4: every op runs through all implementations against one
golden model, cpu_spmv.cpp:866-895). Here: reference / merge /
row_split / double-float against the numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.io import generators
from tpusparse.ops.reference import spmv_numpy
from tpusparse.ops.spmv import plan_matrix, spmv, spmm


MATRICES = [
    ("lap2d", lambda: generators.make_laplacian_grid2d(24).to_csr()),
    ("lap3d", lambda: generators.make_laplacian_grid3d(8).to_csr()),
    ("spd_band", lambda: generators.make_random_spd(
        1000, row_nnz=12, seed=9, bandwidth=200).to_csr()),
    ("wheel", lambda: generators.make_wheel(1500).to_csr()),
]


@pytest.mark.parametrize("name,make", MATRICES)
def test_all_strategies_agree_spmv(name, make, rng):
    csr = make()
    x = rng.standard_normal(csr.num_cols)
    golden = spmv_numpy(csr, x)
    scale = np.abs(golden).max() + 1.0

    results = {}
    for strat, dtype, tol in [
        ("reference", np.float64, 1e-12),
        ("merge", np.float32, 3e-5),
        ("nonzero_split", np.float32, 3e-5),
        ("row_split", np.float32, 3e-5),
    ]:
        A = plan_matrix(csr, strategy=strat, dtype=dtype)
        y = np.asarray(spmv(A, jnp.asarray(x.astype(dtype))))
        err = np.abs(y - golden).max() / scale
        assert err < tol, f"{name}/{strat}: err {err:.2e}"
        results[strat] = y

    # double-float agrees with the fp64 reference to ~1e-13
    from tpusparse.kernels import ell_df

    A_df = ell_df.to_device_ell_df(ell_df.build_df_tiles(csr))
    y_df = np.asarray(ell_df.spmv_ell_df(A_df, jnp.asarray(x)))
    assert np.abs(y_df - golden).max() / scale < 1e-12


@pytest.mark.parametrize("name,make", MATRICES[:2])
def test_all_strategies_agree_spmm(name, make, rng):
    csr = make()
    L = 8
    X = rng.standard_normal((csr.num_cols, L))
    golden = csr.to_scipy() @ X
    scale = np.abs(golden).max() + 1.0
    for strat, dtype, tol in [
        ("reference", np.float64, 1e-12),
        ("merge", np.float32, 5e-5),
        ("row_split", np.float32, 5e-5),
    ]:
        A = plan_matrix(csr, strategy=strat, dtype=dtype, L=L)
        Y = np.asarray(spmm(A, jnp.asarray(X.astype(dtype))))
        err = np.abs(Y - golden).max() / scale
        assert err < tol, f"{name}/{strat}: err {err:.2e}"


def test_bcoo_baseline_agrees(rng):
    """jax.experimental.sparse (the JAX vendor baseline, analogous to
    the reference's MKL checks) agrees with our kernels."""
    from tpusparse.ops.reference import to_bcoo

    csr = generators.make_laplacian_grid2d(16).to_csr()
    x = rng.standard_normal(csr.num_cols)
    golden = spmv_numpy(csr, x)
    m = to_bcoo(csr)
    y = np.asarray(m @ jnp.asarray(x))
    np.testing.assert_allclose(y, golden, rtol=1e-12)
