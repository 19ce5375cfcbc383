"""CG solver tests: convergence, iteration-count parity vs a numpy CG,
multi-RHS masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.io import generators
from tpusparse.solvers.cg import cg_solve, cg_solve_multi


def numpy_cg(A, b, max_iters, tol):
    """Host oracle mirroring the reference CGSolveSingle exactly
    (single_strategy.hpp:105-170): convergence when sqrt(rs) < ||b||*tol,
    checked after the residual update."""
    x = np.zeros_like(b)
    r = b.copy()
    p = b.copy()
    rs = r @ r
    b_norm = np.sqrt(b @ b)
    if b_norm == 0:
        b_norm = 1.0
    threshold = b_norm * tol
    it = 0
    while it < max_iters and np.sqrt(rs) >= threshold:
        Ap = A @ p
        alpha = rs / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        rs_new = r @ r
        beta = rs_new / rs
        p = r + beta * p
        rs = rs_new
        it += 1
    return x, it


@pytest.mark.parametrize(
    "make",
    [
        lambda: generators.make_laplacian_grid2d(16),
        lambda: generators.make_random_spd(400, row_nnz=6, seed=3),
    ],
)
def test_cg_converges_and_matches_numpy_iterations(make, rng):
    csr = make().to_csr()
    b = rng.standard_normal(csr.num_rows)
    d = csr.to_device()
    res = cg_solve(d, jnp.asarray(b), max_iters=2000, tolerance=1e-8)
    assert bool(res.converged)
    # solution correctness
    x = np.asarray(res.x)
    r = b - csr.to_scipy() @ x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-7
    # iteration parity with the host oracle (identical recurrences in f64)
    _, it_np = numpy_cg(csr.to_scipy(), b, 2000, 1e-8)
    assert abs(int(res.iterations) - it_np) <= 1


def test_cg_zero_rhs():
    csr = generators.make_laplacian_grid2d(8).to_csr()
    d = csr.to_device()
    b = jnp.zeros(csr.num_rows, dtype=jnp.float64)
    res = cg_solve(d, b, max_iters=100, tolerance=1e-8)
    assert int(res.iterations) == 0
    np.testing.assert_allclose(np.asarray(res.x), 0.0)


def test_cg_history():
    csr = generators.make_laplacian_grid2d(10).to_csr()
    d = csr.to_device()
    b = jnp.ones(csr.num_rows, dtype=jnp.float64)
    res = cg_solve(d, b, max_iters=500, tolerance=1e-8,
                   record_history=True)
    it = int(res.iterations)
    h = np.asarray(res.history)
    assert np.all(np.isfinite(h[:it]))
    assert np.all(np.isnan(h[it:]))
    assert h[it - 1] < 1e-8


def test_cg_multi_converges_all_lanes(rng):
    csr = generators.make_laplacian_grid2d(12).to_csr()
    B = rng.standard_normal((csr.num_rows, 8))
    d = csr.to_device()
    res = cg_solve_multi(d, jnp.asarray(B), max_iters=2000, tolerance=1e-8)
    assert bool(np.all(np.asarray(res.converged)))
    X = np.asarray(res.x)
    R = B - csr.to_scipy() @ X
    rel = np.linalg.norm(R, axis=0) / np.linalg.norm(B, axis=0)
    assert rel.max() < 1e-7


def test_cg_multi_masking_freezes_converged(rng):
    """Lanes that converge early must freeze exactly (alpha=beta=0)."""
    csr = generators.make_laplacian_grid2d(12).to_csr()
    n = csr.num_rows
    # lane 0: zero RHS converges at iteration 1; lane 1: random
    B = np.stack([np.zeros(n), rng.standard_normal(n)], axis=1)
    d = csr.to_device()
    res = cg_solve_multi(d, jnp.asarray(B), max_iters=2000, tolerance=1e-8)
    X = np.asarray(res.x)
    np.testing.assert_allclose(X[:, 0], 0.0, atol=1e-14)
    assert bool(np.all(np.asarray(res.converged)))


def test_cg_multi_history_is_max_over_lanes(rng):
    csr = generators.make_laplacian_grid2d(10).to_csr()
    B = rng.standard_normal((csr.num_rows, 4))
    d = csr.to_device()
    res = cg_solve_multi(d, jnp.asarray(B), max_iters=1000, tolerance=1e-8,
                         record_history=True)
    it = int(res.iterations)
    h = np.asarray(res.history)
    assert h[it - 1] < 1e-8
    # history is non-increasing in the tail (CG on SPD converges)
    assert h[0] > h[it - 1]


def test_cg_jits():
    csr = generators.make_laplacian_grid2d(8).to_csr()
    d = csr.to_device()
    b = jnp.ones(csr.num_rows, dtype=jnp.float64)

    @jax.jit
    def solve(b):
        return cg_solve(d, b, max_iters=500, tolerance=1e-8).x

    x1 = solve(b)
    x2 = solve(b + 0.0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))


class TestIterativeRefinement:
    def test_single_rhs_reaches_fp64_accuracy(self, rng):
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.refine import cg_solve_refined

        csr = generators.make_laplacian_grid2d(16, dtype=np.float64).to_csr()
        A32 = plan_matrix(csr, dtype=np.float32)
        A64 = plan_matrix(csr, dtype=np.float64, strategy="reference")
        b = rng.standard_normal(csr.num_rows)
        res = cg_solve_refined(A32, A64, jnp.asarray(b))
        assert float(res.residual) < 1e-12
        x = np.asarray(res.x)
        direct = np.linalg.norm(b - csr.to_scipy() @ x)
        assert direct / np.linalg.norm(b) < 1e-11
        assert int(res.refinements) <= 6

    def test_multi_rhs_reaches_fp64_accuracy(self, rng):
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.refine import cg_solve_multi_refined

        csr = generators.make_laplacian_grid3d(8, dtype=np.float64).to_csr()
        A32 = plan_matrix(csr, dtype=np.float32, L=8)
        A64 = plan_matrix(csr, dtype=np.float64, L=8)  # double-float plan
        B = rng.standard_normal((csr.num_rows, 8))
        res = cg_solve_multi_refined(A32, A64, jnp.asarray(B))
        assert float(np.max(np.asarray(res.residual))) < 1e-11
        X = np.asarray(res.x)
        rel = np.linalg.norm(B - csr.to_scipy() @ X, axis=0)
        assert rel.max() / np.linalg.norm(B) < 1e-10

    def test_requires_x64(self):
        # guarded: without x64 the fp64 updates silently truncate
        from tpusparse.solvers.refine import cg_solve_refined
        import jax

        csr = generators.make_laplacian_grid2d(4, dtype=np.float64).to_csr()
        from tpusparse.ops.spmv import plan_matrix

        A32 = plan_matrix(csr, dtype=np.float32)
        with jax.enable_x64(False):
            with pytest.raises(TypeError):
                cg_solve_refined(A32, csr.to_device(), jnp.ones(csr.num_rows))


class TestImplicitDiff:
    def test_grad_through_cg_matches_analytic(self, rng):
        import jax
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.implicit import make_cg_solver

        csr = generators.make_laplacian_grid2d(8, dtype=np.float64).to_csr()
        A = plan_matrix(csr, strategy="reference", dtype=np.float64)
        solve = make_cg_solver(A, tolerance=1e-12)
        b = jnp.asarray(rng.standard_normal(csr.num_rows))

        # L(b) = 0.5 ||A^{-1} b||^2  ->  dL/db = A^{-1} A^{-1} b
        loss = lambda b: 0.5 * jnp.sum(solve(b) ** 2)
        g = np.asarray(jax.grad(loss)(b))

        import scipy.sparse.linalg as spla

        S = csr.to_scipy().tocsc()
        x = spla.spsolve(S, np.asarray(b))
        expect = spla.spsolve(S, x)
        np.testing.assert_allclose(g, expect, rtol=1e-6, atol=1e-8)

    def test_grad_composes_with_jit_and_kernel_plan(self, rng):
        import jax
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.implicit import make_cg_solver_multi

        csr = generators.make_laplacian_grid2d(8, dtype=np.float64).to_csr()
        A = plan_matrix(csr.astype(np.float32), dtype=np.float32, L=4)
        solve = make_cg_solver_multi(A, tolerance=1e-6)
        B = jnp.asarray(
            rng.standard_normal((csr.num_rows, 4)).astype(np.float32))
        f = jax.jit(jax.grad(lambda B: jnp.sum(solve(B) ** 2)))
        g = np.asarray(f(B))
        assert g.shape == B.shape
        assert np.isfinite(g).all() and np.abs(g).max() > 0


class TestBakedDispatch:
    """The baked solver path (plan closed over the jitted solve as a
    compile-time constant — measured 8.2x/iter on the DIA/Hybrid CG
    loop, see solvers.cg._plan_bakeable) must agree exactly with the
    argument dispatch and cache one executable per (RHS shape, solver
    statics) on the plan object."""

    def _dia_plan(self, csr):
        from tpusparse.ops.spmv import plan_matrix

        A = plan_matrix(csr, dtype=np.float32)
        from tpusparse.solvers.cg import _plan_bakeable

        assert _plan_bakeable(A)  # stencil -> Hybrid/DIA
        return A

    def test_baked_matches_arg_dispatch(self, rng):
        csr = generators.make_laplacian_grid3d(8, dtype=np.float32).to_csr()
        A = self._dia_plan(csr)
        b = rng.standard_normal(csr.num_rows).astype(np.float32)
        r_arg = cg_solve(A, b, max_iters=400, tolerance=1e-5, bake=False)
        r_bak = cg_solve(A, b, max_iters=400, tolerance=1e-5)
        assert int(r_arg.iterations) == int(r_bak.iterations)
        np.testing.assert_allclose(
            np.asarray(r_arg.x), np.asarray(r_bak.x), rtol=1e-6, atol=1e-6
        )
        cache = A.__dict__["_tpusparse_baked"]
        assert len(cache) == 1
        # new b, same shape: reuse; changed statics: new entry
        b2 = rng.standard_normal(csr.num_rows).astype(np.float32)
        cg_solve(A, b2, max_iters=400, tolerance=1e-5)
        assert len(cache) == 1
        cg_solve(A, b2, max_iters=300, tolerance=1e-5)
        assert len(cache) == 2

    def test_baked_multi_matches_arg_dispatch(self, rng):
        csr = generators.make_laplacian_grid2d(12, dtype=np.float32).to_csr()
        A = self._dia_plan(csr)
        B = rng.standard_normal((csr.num_rows, 4)).astype(np.float32)
        r_arg = cg_solve_multi(A, B, max_iters=400, tolerance=1e-5,
                               bake=False)
        r_bak = cg_solve_multi(A, B, max_iters=400, tolerance=1e-5)
        assert int(r_arg.iterations) == int(r_bak.iterations)
        np.testing.assert_allclose(
            np.asarray(r_arg.x), np.asarray(r_bak.x), rtol=1e-6, atol=1e-6
        )
        assert "_tpusparse_baked" in A.__dict__

    def test_gather_plans_not_baked(self, rng):
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.cg import _plan_bakeable

        csr = generators.make_laplacian_grid2d(10, dtype=np.float32).to_csr()
        Am = plan_matrix(csr, dtype=np.float32, strategy="merge")
        assert not _plan_bakeable(Am)
        b = rng.standard_normal(csr.num_rows).astype(np.float32)
        cg_solve(Am, b, max_iters=200, tolerance=1e-5)
        assert "_tpusparse_baked" not in Am.__dict__

    def test_size_gate(self):
        from tpusparse.solvers import cg as cgmod
        from tpusparse.ops.spmv import plan_matrix

        csr = generators.make_laplacian_grid2d(12, dtype=np.float32).to_csr()
        A = plan_matrix(csr, dtype=np.float32)
        assert cgmod._plan_bakeable(A)
        old = cgmod.BAKE_MAX_BYTES
        try:
            cgmod.BAKE_MAX_BYTES = 1  # everything oversized
            assert not cgmod._plan_bakeable(A)
        finally:
            cgmod.BAKE_MAX_BYTES = old

    def test_baked_reordered_plan(self, rng):
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.cg import _plan_bakeable

        csr = generators.make_laplacian_grid2d(12, dtype=np.float32).to_csr()
        Ar = plan_matrix(csr, dtype=np.float32, reorder="rcm")
        b = rng.standard_normal(csr.num_rows).astype(np.float32)
        r_arg = cg_solve(Ar, b, max_iters=400, tolerance=1e-5, bake=False)
        r_bak = cg_solve(Ar, b, max_iters=400, tolerance=1e-5)
        assert int(r_arg.iterations) == int(r_bak.iterations)
        np.testing.assert_allclose(
            np.asarray(r_arg.x), np.asarray(r_bak.x), rtol=1e-6, atol=1e-6
        )

    def test_transposed_dia_path_matches_generic(self, rng):
        """The (L, n) transposed fast path (pure-DIA fp32 plans) must
        agree with the generic (n, L) path run on the raw CSR: same
        solution, iteration count within 1 (fp reduction order of the
        dots differs), converged lanes all true."""
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.cg import _pure_dia_of

        csr = generators.make_laplacian_grid3d(6, dtype=np.float32).to_csr()
        A = plan_matrix(csr, dtype=np.float32, L=32)
        assert _pure_dia_of(A) is not None
        B = rng.standard_normal((csr.num_rows, 32)).astype(np.float32)
        r_t = cg_solve_multi(A, B, max_iters=600, tolerance=1e-5)
        A_ref = plan_matrix(csr, dtype=np.float32, strategy="reference")
        r_g = cg_solve_multi(A_ref, B, max_iters=600, tolerance=1e-5)
        assert abs(int(r_t.iterations) - int(r_g.iterations)) <= 1
        assert bool(np.all(np.asarray(r_t.converged)))
        np.testing.assert_allclose(
            np.asarray(r_t.x), np.asarray(r_g.x), rtol=2e-4, atol=2e-4
        )
        # history is recorded identically (max rel error per iteration)
        it = min(int(r_t.iterations), int(r_g.iterations)) - 1
        ht = np.asarray(r_t.history)[:it]
        hg = np.asarray(r_g.history)[:it]
        np.testing.assert_allclose(ht, hg, rtol=0.3)

    def test_stream_plan_transposed_path_matches_generic(
        self, rng, monkeypatch
    ):
        """Stream-plan (DiaStreamDevice) multi-RHS solves take the
        transposed fast path through spmm_dia_stream_t and must agree
        with the generic reference-strategy path."""
        import importlib

        spmv_mod = importlib.import_module("tpusparse.ops.spmv")
        from tpusparse.kernels.dia_stream import DiaStreamDevice
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.cg import _transposed_matmat_of

        monkeypatch.setattr(spmv_mod, "DIA_STREAM_MIN_BYTES", 1024)
        csr = generators.make_laplacian_grid3d(6, dtype=np.float32).to_csr()
        A = plan_matrix(csr, dtype=np.float32, L=16)
        assert isinstance(A.dia, DiaStreamDevice)
        assert _transposed_matmat_of(A)[0] is not None
        B = rng.standard_normal((csr.num_rows, 16)).astype(np.float32)
        r_t = cg_solve_multi(A, B, max_iters=600, tolerance=1e-5)
        A_ref = plan_matrix(csr, dtype=np.float32, strategy="reference")
        r_g = cg_solve_multi(A_ref, B, max_iters=600, tolerance=1e-5)
        assert abs(int(r_t.iterations) - int(r_g.iterations)) <= 1
        assert bool(np.all(np.asarray(r_t.converged)))
        np.testing.assert_allclose(
            np.asarray(r_t.x), np.asarray(r_g.x), rtol=2e-4, atol=2e-4
        )

    def test_nmajor_plan_interleaved_path_matches_generic(self, rng):
        """Explicit n-major plans (strategy='nmajor') take the
        interleaved-state fast path (state in the kernel's guarded
        flat layout, packed once per solve) and must agree with the
        generic reference-strategy path — including at an L that pads
        up to the plan's lane count."""
        from tpusparse.kernels.dia_nmajor import DiaNMajorDevice
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.cg import _interleaved_plan_of

        csr = generators.make_laplacian_grid3d(6, dtype=np.float32).to_csr()
        A_ref = plan_matrix(csr, dtype=np.float32, strategy="reference")
        for L in (16, 13):  # exact lane count and padded (13 -> 16)
            A = plan_matrix(csr, dtype=np.float32, L=L,
                            strategy="nmajor")
            assert isinstance(A.dia, DiaNMajorDevice)
            assert _interleaved_plan_of(A) is not None
            B = rng.standard_normal((csr.num_rows, L)).astype(np.float32)
            r_t = cg_solve_multi(A, B, max_iters=600, tolerance=1e-5)
            r_g = cg_solve_multi(A_ref, B, max_iters=600, tolerance=1e-5)
            assert abs(int(r_t.iterations) - int(r_g.iterations)) <= 1
            assert np.asarray(r_t.converged).shape == (L,)
            assert bool(np.all(np.asarray(r_t.converged)))
            np.testing.assert_allclose(
                np.asarray(r_t.x), np.asarray(r_g.x), rtol=2e-4, atol=2e-4
            )
            it = min(int(r_t.iterations), int(r_g.iterations)) - 1
            np.testing.assert_allclose(
                np.asarray(r_t.history)[:it],
                np.asarray(r_g.history)[:it], rtol=0.3,
            )

    @pytest.mark.slow
    def test_hybrid_with_rest_keeps_generic_path(self, rng):
        """Hybrid plans with a scattered remainder KEEP the generic
        (n, L) path — measured 4% worse transposed (the gather-kernel
        remainder dominates; RESULTS session 9). The solve itself must
        still match the reference strategy."""
        import scipy.sparse as sp

        from tpusparse.formats.csr import CsrMatrix
        from tpusparse.ops.hybrid import HybridPlan
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.cg import _transposed_matmat_of

        n = 3000
        T = sp.diags(
            [np.ones(n - 1), 4 * np.ones(n), np.ones(n - 1)],
            [-1, 0, 1], format="csr",
        )
        N = sp.random(n, n, density=0.001, random_state=2, format="csr")
        # + 8I keeps the noisy matrix strictly diagonally dominant (SPD)
        S = (T + N + N.T + 8 * sp.eye(n)).tocsr().astype(np.float32)
        csr = CsrMatrix.from_scipy(S)
        A = plan_matrix(csr, dtype=np.float32, L=16)
        assert isinstance(A, HybridPlan) and A.rest is not None
        assert _transposed_matmat_of(A)[0] is None
        B = rng.standard_normal((n, 16)).astype(np.float32)
        r_t = cg_solve_multi(A, B, max_iters=600, tolerance=1e-5)
        A_ref = plan_matrix(csr, dtype=np.float32, strategy="reference")
        r_g = cg_solve_multi(A_ref, B, max_iters=600, tolerance=1e-5)
        assert abs(int(r_t.iterations) - int(r_g.iterations)) <= 1
        assert bool(np.all(np.asarray(r_t.converged)))
        np.testing.assert_allclose(
            np.asarray(r_t.x), np.asarray(r_g.x), rtol=2e-4, atol=2e-4
        )

    def test_df_stream_plan_transposed_path_accuracy(
        self, rng, monkeypatch
    ):
        """fp64 stream plans (double-float kernel) ride the transposed
        path through spmm_dia_stream_df_t; the solve must hit the df
        plan's documented ~1e-12 accuracy vs a dense solve."""
        import importlib

        spmv_mod = importlib.import_module("tpusparse.ops.spmv")
        from tpusparse.kernels.dia_stream import DiaStreamDFDevice
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.solvers.cg import _transposed_matmat_of

        monkeypatch.setattr(spmv_mod, "DIA_STREAM_F64_MIN_BYTES", 1024)
        csr = generators.make_laplacian_grid2d(10, dtype=np.float64).to_csr()
        A = plan_matrix(csr, dtype=np.float64, L=4)
        assert isinstance(A.dia, DiaStreamDFDevice)
        assert _transposed_matmat_of(A)[0] is not None
        B = rng.standard_normal((csr.num_rows, 4))
        r = cg_solve_multi(A, B, max_iters=600, tolerance=1e-10)
        assert bool(np.all(np.asarray(r.converged)))
        x_ref = np.stack([
            np.linalg.solve(np.asarray(csr.to_scipy().todense()), B[:, j])
            for j in range(4)
        ], axis=1)
        np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-6,
                                   atol=1e-8)

    def test_fp64_transposed_path_accuracy(self, rng):
        """fp64 multi-RHS also rides the transposed fast path (4.7x
        measured; dots are native lane-wise sums on both paths) and
        must hit full fp64 accuracy vs a dense solve."""
        from tpusparse.ops.spmv import plan_matrix

        csr = generators.make_laplacian_grid2d(10, dtype=np.float64).to_csr()
        A = plan_matrix(csr, dtype=np.float64, L=8)
        B = rng.standard_normal((csr.num_rows, 8))
        r = cg_solve_multi(A, B, max_iters=600, tolerance=1e-8)
        assert bool(np.all(np.asarray(r.converged)))
        x_ref = np.stack([
            np.linalg.solve(np.asarray(csr.to_scipy().todense()), B[:, j])
            for j in range(8)
        ], axis=1)
        np.testing.assert_allclose(np.asarray(r.x), x_ref, rtol=1e-6,
                                   atol=1e-8)


class TestExactPcgReferenceParity:
    """PCG with EXACT IC(0) triangular solves must match a host oracle
    PCG using the SAME factor to ±1 iteration — the reference's PCG
    semantics (incomplete_cholesky.hpp:36-199, exact row-sequential
    substitution, cg/incomplete_cholesky_decomp.hpp:246-341). The
    Jacobi-sweeps preconditioner is the measured perf default; its
    iteration delta vs exact mode is recorded in RESULTS.md."""

    @staticmethod
    def _host_pcg_iters(S, Lf, b, tol, max_iters=2000):
        """Numpy PCG oracle with exact IC(0) solves; counts iterations
        with the same post-update convergence test as pcg_solve_multi."""
        import scipy.sparse as sp
        import scipy.sparse.linalg as spla

        Ls = Lf.to_scipy().tocsr()
        Us = Ls.T.tocsr()

        def apply_m(r):
            return spla.spsolve_triangular(
                Us, spla.spsolve_triangular(Ls, r, lower=True),
                lower=False)

        x = np.zeros_like(b)
        r = b.copy()
        z = apply_m(r)
        p = z.copy()
        rho = r @ z
        bn = np.sqrt(b @ b)
        for it in range(1, max_iters + 1):
            ap = S @ p
            alpha = rho / (p @ ap)
            x += alpha * p
            r -= alpha * ap
            if np.sqrt(r @ r) / bn < tol:
                return it
            z = apply_m(r)
            rho_new = r @ z
            p = z + (rho_new / rho) * p
            rho = rho_new
        return max_iters

    @pytest.mark.parametrize("make,slack", [
        (lambda: generators.make_laplacian_grid2d(16).to_csr(), 1),
        (lambda: generators.make_laplacian_grid3d(8).to_csr(), 1),
        # fem2d: device level-scheduled tri-solves + XLA fp64 dot order
        # diverge from the scipy oracle by a consistent +1..+2 at tol
        # 1e-8 (measured over 8 b-seeds: device 63 vs host 61-62 —
        # same-semantic counts, pure rounding), so the FEM contract is
        # ±2, not ±1
        (lambda: generators.make_fem2d(220, seed=5).to_csr(), 2),
    ])
    def test_exact_pcg_iteration_parity(self, make, slack):
        from tpusparse.ops.spmv import plan_matrix
        from tpusparse.precond.ic0 import ic0_factorize
        from tpusparse.solvers.pcg import (
            make_exact_ic0_preconditioner,
            pcg_solve_multi,
        )

        csr = make()
        S = csr.to_scipy()
        Lf = ic0_factorize(csr)
        # LOCAL rng: the session-scoped fixture's stream position
        # depends on which tests ran before (the round-4 suite growth
        # surfaced this as an order-dependent flake)
        b = np.random.default_rng(99).standard_normal(csr.num_rows)
        tol = 1e-8
        want = self._host_pcg_iters(S, Lf, b, tol)
        A = plan_matrix(csr, dtype=np.float64)
        prec = make_exact_ic0_preconditioner(Lf)
        res = pcg_solve_multi(A, jnp.asarray(b)[:, None], prec,
                              tolerance=tol, max_iters=2000,
                              record_history=False)
        got = int(res.iterations)
        assert bool(res.converged.all())
        assert abs(got - want) <= slack, (got, want)
