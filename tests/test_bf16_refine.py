"""bf16-plane mixed precision: variable-coefficient stencils, the
bf16-plane stream plan, and the two mixed-precision solvers.

Round-5 feature (VERDICT r4 item 1 / ROADMAP N1): variable-coefficient
diagonal operators — the SuiteSparse FD/FEM reality the reference's
constant-coefficient grids idealize (``InitGrid2d/3d``,
``sparse_matrix.h:458-623``) — are plane-stream-bound; bf16 value
planes halve the dominant HBM term. The operator is perturbed ~4e-3,
so correctness rests on full-precision outer residuals: inner/outer
refinement (``cg_solve_refined_f32``) and the production
residual-replacement CG (``cg_solve_bf16``, restart-free, 1.06-1.10x
iteration cost measured vs refinement's 1.33-1.48x).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpusparse.io.generators import (
    make_laplacian_grid3d,
    make_variable_stencil,
)
from tpusparse.ops.spmv import (
    plan_dia_bf16,
    plan_kind,
    plan_matrix,
    plan_semantics,
    spmv,
)
from tpusparse.solvers.cg import cg_solve, cg_solve_multi
from tpusparse.solvers.refine import (
    cg_solve_bf16,
    cg_solve_multi_refined_f32,
    cg_solve_refined_f32,
)


@pytest.fixture(scope="module")
def var27():
    """27-point variable-coefficient SPD fixture (mild conditioning:
    shift=1 models an implicit-timestep operator I + dt*L)."""
    return make_variable_stencil(12, dims=3, full=True, seed=2,
                                 shift=1.0, dtype=np.float32).to_csr()


def test_variable_stencil_structure():
    from tpusparse.formats.dia import (
        partition_dia,
        plane_constants,
        select_diagonals,
    )

    for dims, full, K_want in [(2, False, 5), (3, False, 7),
                               (2, True, 9), (3, True, 27)]:
        csr = make_variable_stencil(10, dims=dims, full=full,
                                    seed=1).to_csr()
        S = csr.to_scipy()
        assert abs(S - S.T).max() == 0          # symmetric
        offs = select_diagonals(csr)
        assert len(offs) == K_want              # full stencil planes
        dia, rest = partition_dia(csr, offs)
        assert rest.nnz == 0                    # pure diagonal runs
        _, ok = plane_constants(dia.data)
        assert not ok.all()                     # variable coefficients
        # SPD: weighted-Laplacian diagonal dominance + positive shift
        d = S.diagonal()
        off_abs = np.abs(S).sum(axis=1).A1 - np.abs(d)
        assert (d >= off_abs + 1e-2 - 1e-5).all()


def test_variable_stencil_spd_solvable():
    csr = make_variable_stencil(8, dims=3, full=True, seed=3,
                                dtype=np.float64).to_csr()
    w = np.linalg.eigvalsh(csr.to_scipy().toarray())
    assert w.min() > 0


def test_plan_dia_bf16_tags_and_accuracy(var27):
    rng = np.random.default_rng(11)
    A16 = plan_dia_bf16(var27)
    assert plan_kind(A16) == "dia_bf16"
    assert plan_semantics(A16) == "bf16-plane(~4e-3)"
    A32 = plan_matrix(var27, strategy="dia", dtype=np.float32)
    assert plan_kind(A32) == "dia"
    x = rng.standard_normal(var27.num_cols).astype(np.float32)
    y16 = np.asarray(spmv(A16, jnp.asarray(x)))
    ref = var27.to_scipy() @ x
    rel = np.abs(y16 - ref).max() / np.abs(ref).max()
    # approximate (bf16 planes) but within the documented band
    assert 1e-5 < rel < 3e-2


def test_plan_dia_bf16_rejects_non_diagonal():
    from tpusparse.formats.coo import CooMatrix

    # pure scatter: every diagonal ~1 entry, none selectable
    n, m = 3000, 2000
    r = np.random.default_rng(0)
    rows = r.integers(0, n, m).astype(np.int32)
    cols = r.integers(0, n, m).astype(np.int32)
    coo = CooMatrix(n, n, rows, cols,
                    np.ones(m, np.float32)).sum_duplicates()
    with pytest.raises(ValueError, match="diagonal"):
        plan_dia_bf16(coo.to_csr())


def test_bf16_masked_conflict_raises():
    from tpusparse.formats.dia import partition_dia, select_diagonals
    from tpusparse.kernels.dia_stream import to_device_dia_stream

    csr = make_laplacian_grid3d(8, dtype=np.float32).to_csr()
    dia, _ = partition_dia(csr, select_diagonals(csr))
    with pytest.raises(ValueError, match="bitmask plan is exact"):
        to_device_dia_stream(dia, masked=True,
                             plane_dtype=jnp.bfloat16)
    # constant-coefficient + bf16 request: value planes, not masked
    D = to_device_dia_stream(dia, plane_dtype=jnp.bfloat16)
    assert D.mask_b is None and D.data_b.dtype == jnp.bfloat16


def test_refined_f32_single_and_multi(var27):
    rng = np.random.default_rng(12)
    A16 = plan_dia_bf16(var27)
    A32 = plan_matrix(var27, strategy="dia", dtype=np.float32)
    b = rng.standard_normal(var27.num_rows).astype(np.float32)
    res = cg_solve_refined_f32(A16, A32, jnp.asarray(b),
                               tolerance=1e-5)
    assert float(res.residual) < 1e-5
    # the residual is computed against the EXACT operator
    x = np.asarray(res.x)
    r = b - var27.to_scipy() @ x
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1.1e-5

    B = rng.standard_normal((var27.num_rows, 3)).astype(np.float32)
    resm = cg_solve_multi_refined_f32(A16, A32, jnp.asarray(B),
                                      tolerance=1e-5)
    assert float(np.max(np.asarray(resm.residual))) < 1e-5


def test_cg_bf16_replacement_parity(var27):
    """The production replacement solver: verified convergence at a
    bounded iteration premium on the mild-conditioning fixture (the
    measured design point: ~1.1x vs plain f32 CG; refinement's
    restarts cost 1.33-1.48x — RESULTS round 5)."""
    rng = np.random.default_rng(13)
    A16 = plan_dia_bf16(var27)
    A32 = plan_matrix(var27, strategy="dia", dtype=np.float32)
    b = rng.standard_normal(var27.num_rows).astype(np.float32)
    r32 = cg_solve(A32, jnp.asarray(b), tolerance=1e-5)
    r16 = cg_solve_bf16(A16, A32, jnp.asarray(b), tolerance=1e-5)
    assert bool(r16.converged)
    assert float(r16.residual) < 1e-5
    # solution solves the EXACT system
    x = np.asarray(r16.x)
    rel = np.linalg.norm(b - var27.to_scipy() @ x) / np.linalg.norm(b)
    assert rel < 1.1e-5
    ratio = int(r16.iterations) / max(int(r32.iterations), 1)
    assert ratio < 1.35, (int(r16.iterations), int(r32.iterations))
    assert int(r16.replacements) >= 1
    assert int(r16.restarts) == 0


def test_cg_bf16_hard_case_honest():
    """Near-singular shift: kappa*eps_bf16 is large, the recurrence
    drifts, the verified outer guard restarts — and still converges
    with honest accounting (the documented limit of the scheme).
    Local rng: this contract is draw-sensitive, and the session-scoped
    fixture made it order-dependent (the round-4 flake class)."""
    rng = np.random.default_rng(14)
    csr = make_variable_stencil(10, dims=3, full=True, seed=2,
                                shift=1e-2, dtype=np.float32).to_csr()
    A16 = plan_dia_bf16(csr)
    A32 = plan_matrix(csr, strategy="dia", dtype=np.float32)
    b = rng.standard_normal(csr.num_rows).astype(np.float32)
    r16 = cg_solve_bf16(A16, A32, jnp.asarray(b), tolerance=1e-4,
                        max_restarts=6)
    assert bool(r16.converged)
    x = np.asarray(r16.x)
    rel = np.linalg.norm(b - csr.to_scipy() @ x) / np.linalg.norm(b)
    assert rel < 1.1e-4


def test_multi_refined_matches_plain_solution(var27):
    rng = np.random.default_rng(15)
    A16 = plan_dia_bf16(var27)
    A32 = plan_matrix(var27, strategy="dia", dtype=np.float32)
    B = rng.standard_normal((var27.num_rows, 2)).astype(np.float32)
    plain = cg_solve_multi(A32, jnp.asarray(B), tolerance=1e-5)
    ref = cg_solve_multi_refined_f32(A16, A32, jnp.asarray(B),
                                     tolerance=1e-5)
    xp, xr = np.asarray(plain.x), np.asarray(ref.x)
    denom = np.abs(xp).max()
    assert np.abs(xp - xr).max() / denom < 5e-5
