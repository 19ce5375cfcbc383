"""Layout-native blocked CG — solver state lives in the kernel layout.

Same recurrences and masking as :func:`tpusparse.solvers.cg.cg_solve_multi`
(reference parity: ``no_pretreatment.hpp:35-197``) but all state arrays
stay in the gather-job kernel's (blocks, L, 128) layout, so each
iteration skips the four pack/unpack transpose passes the generic
solver pays per SpMM — worth ~25% of the iteration time at L=32.

Square matrices only (row space == column space, the CG case)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusparse.kernels.ell_spmm import (
    DeviceEll,
    pack_rows,
    spmm_ell_packed,
    unpack_rows,
)
from tpusparse.solvers.cg import CgResult


def _dot3(a, b):
    """Per-lane dot products in packed layout: (mb, L, 128) -> (L,).
    Multi-lane (L) reductions stay on the native sum — the session-7
    A/B showed XLA's emulated f64 is only pathological for
    scalar-producing cross-lane reductions (see ops.blas._reduce_sum)."""
    return jnp.sum(a * b, axis=(0, 2))


def cg_solve_multi_ell(
    A: DeviceEll,
    B,
    max_iters: int = 10000,
    tolerance: float = 1e-5,
    record_history: bool = True,
) -> CgResult:
    """Blocked multi-RHS CG over a gather-job plan, state in kernel
    layout. B is (n, L); returns the standard CgResult (x unpacked).
    Jit-dispatched like cg_solve_multi (one device dispatch/solve)."""
    return _cg_solve_multi_ell_jit(A, B, int(max_iters),
                                   float(tolerance),
                                   bool(record_history))


import functools as _functools
import jax as _jax


@_functools.partial(_jax.jit, static_argnums=(2, 3, 4))
def _cg_solve_multi_ell_jit(A, B, max_iters, tolerance,
                            record_history) -> CgResult:
    if A.num_rows != A.num_cols:
        raise ValueError("layout-native CG needs a square matrix")
    n, L = B.shape
    if L % 8 != 0:
        pad = (-L) % 8
        B = jnp.concatenate(
            [B, jnp.zeros((n, pad), dtype=B.dtype)], axis=1
        )
    Lp = B.shape[1]

    B3 = pack_rows(A, B)
    X = jnp.zeros_like(B3)
    R = B3
    P = B3
    b_norms = jnp.sqrt(_dot3(B3, B3))
    b_norms = jnp.where(b_norms == 0.0, 1.0, b_norms)
    rs_old = _dot3(R, R)
    converged0 = jnp.zeros((Lp,), dtype=bool)
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
        AP = spmm_ell_packed(A, P)
        pAp = _dot3(P, AP)
        alpha = jnp.where(converged | (pAp == 0), 0.0, rs_old / pAp)
        a3 = alpha[None, :, None]
        X = X + a3 * P
        R = R - a3 * AP
        rs_new = _dot3(R, R)
        rel = jnp.sqrt(rs_new) / b_norms
        converged = converged | (rel < tolerance)
        if record_history:
            hist = hist.at[i].set(jnp.max(rel))
        beta = jnp.where(converged | (rs_old == 0), 0.0, rs_new / rs_old)
        P = R + beta[None, :, None] * P
        return (i + 1, X, R, P, rs_new, converged, hist)

    i, X, R, P, rs, converged, hist = jax.lax.while_loop(
        cond, body, (jnp.int32(0), X, R, P, rs_old, converged0, hist0)
    )
    rel = jnp.sqrt(rs) / b_norms
    return CgResult(
        x=unpack_rows(A, X)[:, :L],
        iterations=i,
        converged=converged[:L],
        residual=rel[:L],
        history=hist,
    )
