"""Triangular solves for the IC(0) preconditioner.

The reference applies z = (L L^T)^{-1} r with two *sequential-over-rows*
substitutions per CG iteration (``ForwardSolveMultiple`` /
``BackwardSolveMultiple``,
``/root/reference/work_2025/cg/incomplete_cholesky_decomp.hpp:246-345``),
SIMD only over the RHS lanes. A row-sequential loop is the one shape a
TPU cannot run fast, so this module provides two re-designs plus the
host oracle:

  * ``forward_solve_host`` / ``backward_solve_host`` — exact numpy
    substitutions (the oracle, and the parity path for iteration-count
    validation against the reference).
  * ``jacobi_trisolve_lower/upper`` — fixed-iteration Jacobi relaxation
    of the triangular system: z_{k+1} = D^{-1} (b - (T - D) z_k).
    Every step is an SpMV/SpMM on the strictly-triangular part — the
    merge-tile kernel's bread and butter — and for a triangular system
    the iteration is *exactly* convergent in nilpotency-index steps
    (T - D strictly triangular => nilpotent), so with enough sweeps it
    reproduces the exact solve; with few sweeps it is an approximate
    preconditioner application (convergence validated in tests).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpusparse.ops.spmv import spmv, spmm


def forward_solve_host(L, b):
    """Solve L x = b, L lower-triangular CSR with sorted columns
    (diagonal last per row). b: (n,) or (n, L_rhs)."""
    ro = np.asarray(L.row_offsets)
    ci = np.asarray(L.col_indices)
    va = np.asarray(L.values)
    b = np.asarray(b)
    x = np.zeros_like(b, dtype=np.float64)
    n = L.num_rows
    for i in range(n):
        s0, s1 = ro[i], ro[i + 1]
        cols = ci[s0 : s1 - 1]
        x[i] = (b[i] - va[s0 : s1 - 1] @ x[cols]) / va[s1 - 1]
    return x


def backward_solve_host(L, b):
    """Solve L^T x = b given lower-triangular L (via its transpose,
    an upper-triangular CSR with the diagonal first per row)."""
    U = L.transpose()
    ro = np.asarray(U.row_offsets)
    ci = np.asarray(U.col_indices)
    va = np.asarray(U.values)
    b = np.asarray(b)
    x = np.zeros_like(b, dtype=np.float64)
    n = U.num_rows
    for i in range(n - 1, -1, -1):
        s0, s1 = ro[i], ro[i + 1]
        # diagonal is the first entry of row i in U = L^T
        cols = ci[s0 + 1 : s1]
        x[i] = (b[i] - va[s0 + 1 : s1] @ x[cols]) / va[s0]
    return x


def split_diag(T):
    """Host helper: split a triangular CSR into (strict part, diag)."""
    from tpusparse.formats.csr import CsrMatrix

    ro = np.asarray(T.row_offsets)
    ci = np.asarray(T.col_indices)
    va = np.asarray(T.values)
    rows = T.row_ids()
    is_diag = ci == rows
    diag = np.zeros(T.num_rows, dtype=va.dtype)
    diag[rows[is_diag]] = va[is_diag]
    keep = ~is_diag
    counts = np.bincount(rows[keep], minlength=T.num_rows)
    new_ro = np.zeros(T.num_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=new_ro[1:])
    strict = CsrMatrix(T.num_rows, T.num_cols, new_ro,
                       ci[keep].astype(np.int32), va[keep].copy())
    return strict, diag


class JacobiTriSolver:
    """Device-side fixed-sweep Jacobi solver for T x = b (T triangular).

    ``strict`` may be any matrix object accepted by ops.spmv (device
    CsrMatrix or merge-tile plan) holding T - diag(T); ``inv_diag`` is
    the reciprocal diagonal. ``sweeps`` bounds the nilpotent recursion:
    sweeps >= longest dependency chain gives the exact solve.
    """

    def __init__(self, strict, inv_diag, sweeps: int = 12,
                 strategy: str = "auto"):
        self.strict = strict
        self.inv_diag = inv_diag
        self.sweeps = sweeps
        self.strategy = strategy

    def solve(self, b):
        d = self.inv_diag
        if b.ndim == 1:
            x = b * d
            for _ in range(self.sweeps):
                x = (b - spmv(self.strict, x, strategy=self.strategy)) * d
            return x
        x = b * d[:, None]
        for _ in range(self.sweeps):
            x = (b - spmm(self.strict, x, strategy=self.strategy)) * d[:, None]
        return x


def _default_plan(strict, num_rhs):
    """Route the strict triangular part through the kernel planner so
    every Jacobi sweep runs on the Pallas SpMM path (fp32); fp64 falls
    back to the reference ops inside plan_matrix."""
    from tpusparse.ops.spmv import plan_matrix

    return plan_matrix(strict, strategy="auto", L=num_rhs)


def jacobi_trisolve_lower(L_host, sweeps: int = 12, to_plan=None,
                          num_rhs: int = 16):
    """Build a JacobiTriSolver for L x = b from a host lower CSR.
    ``to_plan`` overrides the device plan builder (default: the AUTO
    kernel planner, sized for ``num_rhs`` right-hand sides)."""
    strict, diag = split_diag(L_host)
    dev = (to_plan(strict) if to_plan
           else _default_plan(strict, num_rhs))
    return JacobiTriSolver(dev, jnp.asarray(1.0 / diag), sweeps)


def jacobi_trisolve_upper(L_host, sweeps: int = 12, to_plan=None,
                          num_rhs: int = 16):
    """Build a JacobiTriSolver for L^T x = b."""
    strict, diag = split_diag(L_host.transpose())
    dev = (to_plan(strict) if to_plan
           else _default_plan(strict, num_rhs))
    return JacobiTriSolver(dev, jnp.asarray(1.0 / diag), sweeps)
