"""Layout-native CG: parity with the generic solver."""

import jax.numpy as jnp
import numpy as np

from tpusparse.formats.ell import build_ell_tiles
from tpusparse.io import generators
from tpusparse.kernels import ell_spmm
from tpusparse.solvers.cg import cg_solve_multi
from tpusparse.solvers.cg_ell import cg_solve_multi_ell


def test_cg_ell_matches_generic(rng):
    csr = generators.make_laplacian_grid2d(16).to_csr()
    A = ell_spmm.to_device_ell(build_ell_tiles(csr), dtype=np.float32)
    B = rng.standard_normal((csr.num_rows, 8)).astype(np.float32)
    r1 = cg_solve_multi_ell(A, jnp.asarray(B), max_iters=500,
                            tolerance=1e-5)
    r2 = cg_solve_multi(A, jnp.asarray(B), max_iters=500,
                        tolerance=1e-5)
    assert int(r1.iterations) == int(r2.iterations)
    assert bool(np.all(np.asarray(r1.converged)))
    np.testing.assert_allclose(
        np.asarray(r1.x), np.asarray(r2.x), rtol=2e-4, atol=2e-5
    )


def test_cg_ell_odd_lane_count(rng):
    csr = generators.make_laplacian_grid2d(12).to_csr()
    A = ell_spmm.to_device_ell(build_ell_tiles(csr), dtype=np.float32)
    B = rng.standard_normal((csr.num_rows, 5)).astype(np.float32)
    r = cg_solve_multi_ell(A, jnp.asarray(B), max_iters=500,
                           tolerance=1e-5)
    assert bool(np.all(np.asarray(r.converged)))
    X = np.asarray(r.x)
    assert X.shape == B.shape
    rel = np.linalg.norm(B - csr.to_scipy() @ X, axis=0)
    rel /= np.linalg.norm(B, axis=0)
    assert rel.max() < 1e-4
