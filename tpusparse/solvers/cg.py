"""Conjugate-gradient solvers: single-RHS and blocked multi-RHS.

Capability parity with the reference solvers, re-designed as jitted
``lax.while_loop`` programs:

  * ``cg_solve``       — CGSolveSingle
    (``/root/reference/work_2025/main/single_strategy.hpp:105-170``).
  * ``cg_solve_multi`` — CGSolveMultiple
    (``/root/reference/work_2025/main/no_pretreatment.hpp:35-197``):
    simultaneous CG over L right-hand sides with per-vector alpha/beta
    and convergence masks — converged lanes get alpha = beta = 0 (x and
    r freeze, p follows r), while the SpMM keeps running full-width,
    exactly as the reference does for SIMD efficiency.

Convergence rule (parity with ``no_pretreatment.hpp:130-155``):
``sqrt(r.r) / ||b|| < tolerance`` per lane, with ``||b|| == 0``
replaced by 1. The per-iteration maximum relative error across lanes is
recorded (the reference's ``max_errors`` history, written to CSV by
``cpu_multicg.cpp:67-86``) into a fixed-size device array.

Preconditioned variants live in :mod:`tpusparse.solvers.pcg` (IC(0)) and
:mod:`tpusparse.solvers.spai_cg` (SPAI).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from tpusparse.ops.blas import (
    axpy_multiple,
    dot_multiple,
    dot_single,
    update_p_multiple,
)
from tpusparse.ops.spmv import spmm, spmv


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CgResult:
    x: Any              # solution (n,) or (n, L)
    iterations: Any     # int32 scalar — iterations executed
    converged: Any      # bool scalar or (L,) mask
    residual: Any       # final relative residual(s)
    history: Any        # (max_iters,) max relative error per iteration
                        # (NaN beyond the executed range)

    def tree_flatten(self):
        return (
            (self.x, self.iterations, self.converged, self.residual,
             self.history),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _matvec(A, strategy):
    return lambda v: spmv(A, v, strategy=strategy)


def _matmat(A, strategy):
    return lambda V: spmm(A, V, strategy=strategy)


def cg_solve(
    A,
    b,
    max_iters: int = 10000,
    tolerance: float = 1e-5,
    strategy: str = "auto",
    x0=None,
    matvec: Callable | None = None,
    record_history: bool = False,
) -> CgResult:
    """Single-RHS CG (parity: CGSolveSingle, single_strategy.hpp:105-170).

    Textbook CG from x0 = 0: r = p = b; per iteration
    alpha = rs/(p.Ap); x += alpha p; r -= alpha Ap;
    converged when sqrt(rs_new) < ||b|| * tolerance;
    beta = rs_new/rs_old; p = r + beta p.

    Jit-dispatched for the common case (no custom matvec / x0): an
    eager solve pays ~10 host dispatches regardless of matrix size —
    ~250 ms through the axon tunnel — while the jitted solve is one.
    """
    if matvec is None and x0 is None:
        return _cg_solve_jit(A, b, int(max_iters), float(tolerance),
                             strategy, bool(record_history))
    return _cg_solve_impl(A, b, max_iters, tolerance, strategy, x0,
                          matvec, record_history)


def _cg_solve_impl(A, b, max_iters, tolerance, strategy, x0, matvec,
                   record_history) -> CgResult:
    from tpusparse.ops.reorder import ReorderedPlan

    inv_perm = None
    if isinstance(A, ReorderedPlan) and matvec is None and x0 is None:
        # solve in the permuted space (traced INSIDE the jitted
        # worker — still one host dispatch): one gather of b in, one
        # of x out, instead of two per iteration. Residual norms and
        # the iteration trajectory are permutation-invariant.
        b = jnp.asarray(b)[A.perm]
        inv_perm = A.inv_perm
        A = A.inner
    mv = matvec if matvec is not None else _matvec(A, strategy)
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - mv(x) if x0 is not None else b
    p = r
    rs = dot_single(r, r)
    b_norm = jnp.sqrt(dot_single(b, b))
    b_norm = jnp.where(b_norm == 0.0, 1.0, b_norm)
    threshold = b_norm * tolerance
    hist0 = (
        jnp.full((max_iters,), jnp.nan, dtype=b.dtype)
        if record_history
        else jnp.zeros((0,), dtype=b.dtype)
    )

    def cond(state):
        i, x, r, p, rs, hist = state
        return (i < max_iters) & (jnp.sqrt(rs) >= threshold)

    def body(state):
        i, x, r, p, rs, hist = state
        Ap = mv(p)
        pAp = dot_single(p, Ap)
        alpha = jnp.where(pAp == 0, 0.0, rs / pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = dot_single(r, r)
        if record_history:
            hist = hist.at[i].set(jnp.sqrt(rs_new) / b_norm)
        # rs == 0 means the residual underflowed to exactly zero (fp32
        # long past convergence — e.g. a tolerance=0 measurement run):
        # 0/0 would NaN the state and break the loop's iteration count;
        # freeze p on r instead, mirroring the multi-RHS mask.
        beta = jnp.where(rs == 0, 0.0, rs_new / rs)
        p = r + beta * p
        return (i + 1, x, r, p, rs_new, hist)

    i, x, r, p, rs, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), x, r, p, rs, hist0)
    )
    rel = jnp.sqrt(rs) / b_norm
    return CgResult(
        x=x if inv_perm is None else x[inv_perm],
        iterations=i,
        converged=rel < tolerance,
        residual=rel,
        history=hist,
    )


def cg_solve_multi(
    A,
    B,
    max_iters: int = 10000,
    tolerance: float = 1e-5,
    strategy: str = "auto",
    matmat: Callable | None = None,
    record_history: bool = True,
) -> CgResult:
    """Blocked multi-RHS CG (parity: CGSolveMultiple,
    no_pretreatment.hpp:35-197). B is (n, L); solves A X = B for all L
    columns simultaneously with per-lane convergence masking.

    Jit-dispatched when no custom matmat is given (see cg_solve)."""
    if matmat is None:
        return _cg_solve_multi_jit(A, B, int(max_iters),
                                   float(tolerance), strategy,
                                   bool(record_history))
    return _cg_solve_multi_impl(A, B, max_iters, tolerance, strategy,
                                matmat, record_history)


def _cg_solve_multi_impl(A, B, max_iters, tolerance, strategy, matmat,
                         record_history) -> CgResult:
    from tpusparse.ops.reorder import ReorderedPlan

    inv_perm = None
    if isinstance(A, ReorderedPlan) and matmat is None:
        # permuted-space solve (see _cg_solve_impl): two gathers per
        # SOLVE instead of two per iteration, still one dispatch
        B = jnp.asarray(B)[A.perm]
        inv_perm = A.inv_perm
        A = A.inner
    mm = matmat if matmat is not None else _matmat(A, strategy)
    n, L = B.shape
    X = jnp.zeros_like(B)
    R = B
    P = B
    b_norms = jnp.sqrt(dot_multiple(B, B))
    b_norms = jnp.where(b_norms == 0.0, 1.0, b_norms)
    rs_old = dot_multiple(R, R)
    converged0 = jnp.zeros((L,), dtype=bool)
    hist0 = (
        jnp.full((max_iters,), jnp.nan, dtype=B.dtype)
        if record_history
        else jnp.zeros((0,), dtype=B.dtype)
    )

    def cond(state):
        i, X, R, P, rs_old, converged, hist = state
        return (i < max_iters) & ~jnp.all(converged)

    def body(state):
        i, X, R, P, rs_old, converged, hist = state
        AP = mm(P)
        pAp = dot_multiple(P, AP)
        # Converged lanes freeze: alpha = 0 (no_pretreatment.hpp:109-120).
        # pAp == 0 means P = 0 (A SPD), i.e. the lane already converged in
        # exact arithmetic — guard the division so such lanes freeze
        # instead of propagating NaN.
        alpha = jnp.where(converged | (pAp == 0), 0.0, rs_old / pAp)
        X = axpy_multiple(X, alpha, P)
        R = axpy_multiple(R, -alpha, AP)
        rs_new = dot_multiple(R, R)
        rel = jnp.sqrt(rs_new) / b_norms
        converged = converged | (rel < tolerance)
        if record_history:
            hist = hist.at[i].set(jnp.max(rel))
        beta = jnp.where(converged | (rs_old == 0), 0.0, rs_new / rs_old)
        P = update_p_multiple(R, beta, P)
        return (i + 1, X, R, P, rs_new, converged, hist)

    i, X, R, P, rs, converged, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), X, R, P, rs_old, converged0, hist0)
    )
    rel = jnp.sqrt(rs) / b_norms
    return CgResult(
        x=X if inv_perm is None else X[inv_perm],
        iterations=i,
        converged=converged,
        residual=rel,
        history=hist,
    )


# Jitted workers: the matrix plan and RHS are traced operands (every
# plan type is a registered pytree); loop bounds / tolerances /
# strategy strings are static. One cache entry per (plan structure,
# shapes, params) — repeated solves are a single device dispatch.
import functools as _functools


@_functools.partial(
    jax.jit, static_argnums=(2, 3, 4, 5)
)
def _cg_solve_jit(A, b, max_iters, tolerance, strategy, record_history):
    return _cg_solve_impl(A, b, max_iters, tolerance, strategy, None,
                          None, record_history)


@_functools.partial(
    jax.jit, static_argnums=(2, 3, 4, 5)
)
def _cg_solve_multi_jit(A, B, max_iters, tolerance, strategy,
                        record_history):
    return _cg_solve_multi_impl(A, B, max_iters, tolerance, strategy,
                                None, record_history)
