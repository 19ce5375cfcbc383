"""Mixed-precision iterative refinement — fp64 solutions at fp32 speed.

The reference solves in fp64 end-to-end (``cpu_spmv.cpp:979-986``
default dtype; CG recurrences in ``work_2025/main/*``). On TPU, fp64
vector arithmetic is emulated and the Pallas kernels are fp32, so the
TPU-native route to fp64-accurate solutions is classic iterative
refinement (Wilkinson; the same structure mixed-precision HPL-AI uses):

    x = 0
    repeat:
        r = b - A x          in fp64 (double-float kernel or XLA f64)
        d = CG_solve(A32, r) in fp32 (the fast Pallas path)
        x = x + d            in fp64

Each refinement contracts the residual by roughly the fp32 solve's
relative accuracy (~1e-6), so ~2-4 refinements reach the 1e-12
BASELINE bar while every inner iteration runs the fp32 kernels. Each
refinement step (accurate residual + whole inner solve + update) is
one jitted dispatch.

Beyond-reference capability; the accuracy target is BASELINE.md's
"fp64 SpMV results within 1e-12 of the CPU reference".
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from tpusparse.ops.blas import dot_multiple, dot_single
from tpusparse.ops.spmv import spmv, spmm
from tpusparse.solvers.cg import (
    _cg_solve_impl,
    _cg_solve_multi_impl,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RefineResult:
    x: Any               # fp64 solution (n,) or (n, L)
    refinements: Any     # outer iterations executed
    inner_iterations: Any  # total fp32 CG iterations
    residual: Any        # final fp64 relative residual(s)

    def tree_flatten(self):
        return ((self.x, self.refinements, self.inner_iterations,
                 self.residual), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _refine_step(A32, A_acc, state, inner_max_iters, inner_tolerance,
                 strategy, multi):
    """One refinement: fp64 residual -> fp32 CG correction -> update."""
    x, b, total_inner = state
    r = b - (spmm(A_acc, x) if multi else spmv(A_acc, x))
    r = r.astype(jnp.float64)
    solve = _cg_solve_multi_impl if multi else _cg_solve_impl
    if multi:
        res = solve(A32, r.astype(jnp.float32), inner_max_iters,
                    inner_tolerance, strategy, None, False)
    else:
        res = solve(A32, r.astype(jnp.float32), inner_max_iters,
                    inner_tolerance, strategy, None, None, False)
    x = x + res.x.astype(jnp.float64)
    return (x, b, total_inner + res.iterations), r


def _solve_refined(A32, A_acc, b, multi, tolerance, inner_tolerance,
                   inner_max_iters, max_refinements, strategy):
    if not jax.config.jax_enable_x64:
        raise TypeError(
            "iterative refinement needs jax_enable_x64=True: the "
            "residual and solution updates are fp64 ops"
        )
    b = jnp.asarray(b, dtype=jnp.float64)
    bn = jnp.sqrt(
        dot_multiple(b, b) if multi else dot_single(b, b)
    )
    bn = jnp.where(bn == 0.0, 1.0, bn)
    x = jnp.zeros_like(b)
    state = (x, b, jnp.int32(0))
    rel = None
    refinements = 0
    # host loop: a handful of outer steps, each ONE jitted dispatch
    for k in range(max_refinements):
        state, r = _refine_step(
            A32, A_acc, state, int(inner_max_iters),
            float(inner_tolerance), strategy, multi
        )
        rn = jnp.sqrt(
            dot_multiple(r, r) if multi else dot_single(r, r)
        )
        rel = rn / bn
        refinements = k + 1
        if float(jnp.max(rel)) < tolerance and k > 0:
            break
    x, b, total_inner = state
    # final residual after the last correction
    r = b - (spmm(A_acc, x) if multi else spmv(A_acc, x))
    rn = jnp.sqrt(dot_multiple(r, r) if multi else dot_single(r, r))
    rel = rn / bn
    return RefineResult(
        x=x,
        refinements=refinements,
        inner_iterations=total_inner,
        residual=rel,
    )


def cg_solve_refined(A32, A_acc, b, tolerance: float = 1e-12,
                     inner_tolerance: float = 1e-7,
                     inner_max_iters: int = 10000,
                     max_refinements: int = 8,
                     strategy: str = "auto") -> RefineResult:
    """Single-RHS fp64 solve via fp32 CG + fp64 residual refinement.

    ``A32``: any fp32 plan (merge / ELL / BSR / reference);
    ``A_acc``: an fp64-accurate operator for residuals — the
    double-float plan (``plan_matrix(csr, dtype=np.float64)``) or an
    fp64 device CSR."""
    return _solve_refined(A32, A_acc, b, False, tolerance,
                          inner_tolerance, inner_max_iters,
                          max_refinements, strategy)


def cg_solve_multi_refined(A32, A_acc, B, tolerance: float = 1e-12,
                           inner_tolerance: float = 1e-7,
                           inner_max_iters: int = 10000,
                           max_refinements: int = 8,
                           strategy: str = "auto") -> RefineResult:
    """Blocked multi-RHS variant of :func:`cg_solve_refined`."""
    return _solve_refined(A32, A_acc, B, True, tolerance,
                          inner_tolerance, inner_max_iters,
                          max_refinements, strategy)
