"""Pallas device permutation kernel (kernels/permute.py).

Round-4 addition: XLA-TPU's element gather runs at ~0.14 Gelem/s (the
ReorderedPlan per-call cliff); the kernel permutes at the hardware-
gather rate and is EXACT (pure selects). Anchors the reference's
relabeling capability (``sparse_matrix.h:184-207``) on device.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpusparse.io import generators
from tpusparse.kernels.permute import (
    SPAN,
    TILE,
    PermutePlan,
    build_permute_plan,
    permute_apply,
)
from tpusparse.ops.reorder import ReorderedPlan, degree_order, plan_reorder
from tpusparse.ops.spmv import spmv
from tpusparse.ops.reference import spmv_numpy


@pytest.mark.parametrize("n", [128, 1000, 1024, 4096])
def test_permute_exact_random(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n).astype(np.float32)
    perm = rng.permutation(n)
    P = build_permute_plan(perm)
    y = np.asarray(permute_apply(P, jnp.asarray(x)))
    np.testing.assert_array_equal(y, x[perm])  # EXACT, not allclose


def test_permute_identity_reverse_int32():
    n = 5000
    rng = np.random.default_rng(0)
    xi = rng.integers(-(2**30), 2**30, n).astype(np.int32)
    for perm in (np.arange(n), np.arange(n)[::-1].copy()):
        P = build_permute_plan(perm)
        np.testing.assert_array_equal(
            np.asarray(permute_apply(P, jnp.asarray(xi))), xi[perm])


def test_permute_validation():
    """Mismatched inputs raise clearly instead of silent wrong
    gathers / opaque jit shape errors (ADVICE r4)."""
    n = 600
    rng = np.random.default_rng(7)
    perm = rng.permutation(n)
    P = build_permute_plan(perm)
    with pytest.raises(ValueError, match="elements but the plan"):
        permute_apply(P, jnp.zeros(n + 1, jnp.float32))
    bad = perm.copy()
    bad[0] = n  # out of range
    with pytest.raises(ValueError, match=r"\[0, 600\)"):
        build_permute_plan(bad)
    with pytest.raises(ValueError):
        build_permute_plan(np.array([-1, 0, 1]))


@pytest.mark.slow
def test_permute_exact_random_large():
    """Interpret-mode scale case (hundreds of grid steps) — slow."""
    n = 70000
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n).astype(np.float32)
    perm = rng.permutation(n)
    y = np.asarray(permute_apply(build_permute_plan(perm),
                                 jnp.asarray(x)))
    np.testing.assert_array_equal(y, x[perm])


@pytest.mark.slow
def test_permute_wide_tile_splits():
    """A tile touching more than SPAN source blocks splits into
    several subtiles; their disjoint accumulates stay exact."""
    n = 16 * TILE  # 128 source blocks; random perm tiles touch ~all
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    P = build_permute_plan(perm)
    assert P.nsub > n // TILE
    assert P.blk.shape[2] == SPAN
    x = rng.standard_normal(n).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(permute_apply(P, jnp.asarray(x))), x[perm])


def test_reordered_plan_carries_kernel_permutes(rng):
    csr = generators.make_rmat(12, dtype=np.float32).to_csr()
    A = plan_reorder(csr, strategy="merge", dtype=np.float32,
                     order="degree")
    assert isinstance(A, ReorderedPlan)
    assert isinstance(A.kperm, PermutePlan)
    assert isinstance(A.kinv, PermutePlan)
    # spmv dispatch routes through the kernel permutes and still
    # matches the original-coordinate oracle
    x = rng.standard_normal(csr.num_cols)
    golden = spmv_numpy(csr, x)
    y = np.asarray(spmv(A, jnp.asarray(x.astype(np.float32))))
    scale = np.abs(golden).max()
    np.testing.assert_allclose(y / scale, golden / scale, atol=5e-5)
    # apply_perm/apply_inv roundtrip is exact
    v = rng.standard_normal(csr.num_cols).astype(np.float32)
    w = np.asarray(A.apply_inv(A.apply_perm(jnp.asarray(v))))
    np.testing.assert_array_equal(w, v)
    # fp64 vectors fall back to the XLA gather (no 64-bit Mosaic)
    v64 = rng.standard_normal(csr.num_cols)
    np.testing.assert_array_equal(
        np.asarray(A.apply_perm(jnp.asarray(v64))),
        v64[np.asarray(A.perm)])


def test_cg_reordered_uses_kernel_boundary(rng):
    """Single-RHS CG on a ReorderedPlan (kernel boundary permutes)
    still converges to the original-coordinate solution."""
    from tpusparse.ops.reorder import permute_symmetric
    from tpusparse.solvers.cg import cg_solve

    csr = generators.make_laplacian_grid2d(24, dtype=np.float64).to_csr()
    scram = np.random.default_rng(5).permutation(csr.num_rows)
    scr = permute_symmetric(csr, scram)
    A = plan_reorder(scr, strategy="merge", dtype=np.float32,
                     order="rcm")
    assert A.kperm is not None
    b = rng.standard_normal(scr.num_rows).astype(np.float32)
    res = cg_solve(A, jnp.asarray(b), max_iters=2000, tolerance=1e-5)
    assert bool(res.converged)
    rel = np.linalg.norm(
        b - scr.to_scipy() @ np.asarray(res.x, dtype=np.float64)
    ) / np.linalg.norm(b)
    assert rel < 1e-4
