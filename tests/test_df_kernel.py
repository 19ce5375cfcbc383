"""Double-float SpMM kernel: fp64 precision tests (interpret on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.kernels.ell_df import build_df_tiles
from tpusparse.io import generators
from tpusparse.kernels import ell_df


def test_split_roundtrip(rng):
    a = rng.standard_normal(1000) * np.logspace(-8, 8, 1000)
    hi, lo = ell_df.split_f64(a)
    back = hi.astype(np.float64) + lo.astype(np.float64)
    np.testing.assert_allclose(back, a, rtol=3e-15)


@pytest.mark.parametrize("L", [1, 8])
def test_df_spmm_fp64_precision(L, rng):
    """Double-float results must sit within ~1e-13 of the fp64 oracle —
    far beyond fp32 (~1e-7). This is the BASELINE 1e-12 criterion."""
    csr = generators.make_laplacian_grid2d(16).to_csr()
    v = np.asarray(csr.values)
    csr.values = v * (1.0 + rng.standard_normal(v.shape) * 0.1)
    A = ell_df.to_device_ell_df(build_df_tiles(csr))
    X = rng.standard_normal((csr.num_cols, L))
    Y = np.asarray(ell_df.spmm_ell_df(A, jnp.asarray(X)))
    expect = csr.to_scipy() @ X
    scale = np.abs(expect).max()
    err = np.abs(Y - expect).max() / scale
    assert err < 1e-13, f"df64 err {err:.2e}"


def test_df_beats_fp32(rng):
    from tpusparse.kernels import ell_spmm

    csr = generators.make_laplacian_grid3d(6).to_csr()
    v = np.asarray(csr.values)
    csr.values = v * (1.0 + rng.standard_normal(v.shape) * 0.3)
    tiles = build_df_tiles(csr)
    x = rng.standard_normal(csr.num_cols)
    expect = csr.to_scipy() @ x

    A32 = ell_spmm.to_device_ell(tiles, dtype=np.float32)
    y32 = np.asarray(ell_spmm.spmv_ell(A32, jnp.asarray(
        x.astype(np.float32))))
    Adf = ell_df.to_device_ell_df(tiles)
    ydf = np.asarray(ell_df.spmv_ell_df(Adf, jnp.asarray(x)))

    scale = np.abs(expect).max()
    err32 = np.abs(y32 - expect).max() / scale
    errdf = np.abs(ydf - expect).max() / scale
    assert errdf < 1e-13
    assert errdf < err32 * 1e-4  # orders of magnitude tighter


def test_df_lane_padding_is_multiple_of_8(rng):
    """L=12 must pad to 16 lanes (a multiple of 8), not stay at 12: a
    (12, 128) gather tile violates the Mosaic sublane constraint on real
    TPU even though interpret mode accepts it (ADVICE round 1)."""
    csr = generators.make_laplacian_grid2d(10).to_csr()
    A = ell_df.to_device_ell_df(build_df_tiles(csr))
    X = rng.standard_normal((csr.num_cols, 12))
    Y = np.asarray(ell_df.spmm_ell_df(A, jnp.asarray(X)))
    expect = csr.to_scipy() @ X
    np.testing.assert_allclose(Y, expect, rtol=1e-12, atol=1e-12)


def test_df_lane_chunking_beyond_vmem_budget(rng, monkeypatch):
    """fp64 SpMM at an (artificially tiny) VMEM budget must lane-chunk
    and still be exact — round 1 fell back to the ~200x-slower XLA path
    whenever num_cols*2L*4B exceeded the budget."""
    from tpusparse.kernels import ell_spmm

    csr = generators.make_laplacian_grid2d(12).to_csr()
    A = ell_df.to_device_ell_df(build_df_tiles(csr))
    L = 32
    # budget forces ~8-lane chunks: num_cols*2*4 bytes per lane
    monkeypatch.setattr(
        ell_spmm, "X_VMEM_BUDGET_BYTES", csr.num_cols * 2 * 4 * 8
    )
    X = rng.standard_normal((csr.num_cols, L))
    Y = np.asarray(ell_df.spmm_ell_df(A, jnp.asarray(X)))
    expect = csr.to_scipy() @ X
    scale = np.abs(expect).max()
    assert np.abs(Y - expect).max() / scale < 1e-13


def test_df_requires_x64(rng):
    """Without x64 the hi/lo split silently loses the lo plane; the
    kernel must refuse loudly instead (ADVICE round 1)."""
    import jax

    csr = generators.make_laplacian_grid2d(8).to_csr()
    A = ell_df.to_device_ell_df(build_df_tiles(csr))
    X = jnp.asarray(rng.standard_normal((csr.num_cols, 8)))
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(TypeError, match="x64"):
            ell_df.spmm_ell_df(A, X)
    finally:
        jax.config.update("jax_enable_x64", True)


def test_df_alpha_beta(rng):
    csr = generators.make_laplacian_grid2d(10).to_csr()
    A = ell_df.to_device_ell_df(build_df_tiles(csr))
    X = rng.standard_normal((csr.num_cols, 4))
    Y0 = rng.standard_normal((csr.num_rows, 4))
    got = np.asarray(
        ell_df.spmm_ell_df(A, jnp.asarray(X), alpha=2.0, beta=-0.5,
                           Y=jnp.asarray(Y0))
    )
    expect = 2.0 * (csr.to_scipy() @ X) - 0.5 * Y0
    np.testing.assert_allclose(got, expect, rtol=1e-12, atol=1e-12)


def test_fp64_cg_via_df64_iteration_parity(rng):
    """fp64 multi-RHS CG through the double-float plan must converge in
    the same iterations as the fp64 reference path (BASELINE parity)."""
    import jax.numpy as jnp
    from tpusparse.io import generators
    from tpusparse.ops.spmv import plan_matrix
    from tpusparse.solvers.cg import cg_solve_multi

    csr = generators.make_laplacian_grid2d(24).to_csr()
    B = rng.standard_normal((csr.num_rows, 8))
    # AUTO now peels the stencil to the native-f64 DIA path; request the
    # double-float plan explicitly (row_split is its strategy name).
    A_df = plan_matrix(csr, strategy="row_split", dtype=np.float64, L=8)
    from tpusparse.kernels.ell_df import DeviceEllDF

    assert isinstance(A_df, DeviceEllDF)
    res_df = cg_solve_multi(A_df, jnp.asarray(B), max_iters=2000,
                            tolerance=1e-10)
    A_ref = plan_matrix(csr, strategy="reference", dtype=np.float64)
    res_ref = cg_solve_multi(A_ref, jnp.asarray(B), max_iters=2000,
                             tolerance=1e-10)
    assert bool(np.all(np.asarray(res_df.converged)))
    assert int(res_df.iterations) == int(res_ref.iterations)
    np.testing.assert_allclose(
        np.asarray(res_df.x), np.asarray(res_ref.x), rtol=1e-9, atol=1e-9
    )
