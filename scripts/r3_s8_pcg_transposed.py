#!/usr/bin/env python
"""Prototype: transposed-state PCG-IC(0) at L=32 (lap3d-32 fp32).

Current CLI row: 353 us/iter. Components: A-matvec on the (n, L) path
(~10 us), 2x Jacobi tri-solves (2 sweeps each = 4 gather SpMMs on the
IC(0) factor plans) + 5 per-lane-scalar BLAS-1 ops in (n, L) — the
layout cliff (+94 us at L=32 in CG). Variants measured:
  pcg_now   — pcg_solve_multi as shipped (baseline)
  apply     — the preconditioner apply alone in a fori chain
  pcg_T     — transposed state: DIA A-matvec via spmm_dia_t, BLAS-1
              in (L, n), apply_precond wrapped in boundary transposes
"""

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix  # noqa: E402
from tpusparse.ops.dia import spmm_dia_t  # noqa: E402
from tpusparse.precond.ic0 import ic0_factorize  # noqa: E402
from tpusparse.solvers.pcg import (  # noqa: E402
    make_ic0_preconditioner,
    pcg_solve_multi,
)

_c = {}


def timeit(name, make_run):
    outs = []
    for _ in range(2):
        st = iter_slope(make_run, iters=(20, 420), sets=1, reps=3)
        outs.append(st.median_s)
    print(f"{name}: {min(outs)*1e6:.2f} us/iter")


if __name__ == "__main__":
    L = 32
    dtype = np.float32
    csr = generators.make_laplacian_grid3d(32, dtype=dtype).to_csr()
    A = plan_matrix(csr, dtype=dtype, L=L)
    D = A.dia
    Lfac = ic0_factorize(csr)
    prec = make_ic0_preconditioner(Lfac, sweeps=2, num_rhs=L,
                                   dtype=dtype)
    rng = np.random.default_rng(0)
    n = csr.num_rows
    B = jnp.asarray(rng.standard_normal((n, L)).astype(dtype))
    BT = B.T

    def run_now(M):
        if ("now", M) not in _c:
            _c[("now", M)] = jax.jit(lambda B_: pcg_solve_multi(
                A, B_, prec, max_iters=M, tolerance=0.0))
        float(jnp.sum(_c[("now", M)](B).x))

    def run_apply(M):
        if ("apply", M) not in _c:
            def body(i, R):
                Z = prec(R).astype(R.dtype)
                return Z * 1e-3 + R
            _c[("apply", M)] = jax.jit(
                lambda B_: jax.lax.fori_loop(0, M, body, B_))
        float(jnp.sum(_c[("apply", M)](B)))

    def run_T(M):
        if ("T", M) not in _c:
            def body(state):
                i, X, R, P, rho_old = state
                AP = spmm_dia_t(D, P)
                pAp = jnp.sum(P * AP, axis=1)
                alpha = jnp.where(pAp == 0, 0.0, rho_old / pAp)
                X = X + alpha[:, None] * P
                R = R - alpha[:, None] * AP
                Z = prec(R.T).astype(R.dtype).T  # boundary transposes
                rho_new = jnp.sum(R * Z, axis=1)
                beta = jnp.where(rho_old == 0, 0.0, rho_new / rho_old)
                P = Z + beta[:, None] * P
                return (i + 1, X, R, P, rho_new)

            def run(B_):
                st0 = (jnp.int32(0), jnp.zeros_like(B_), B_, B_,
                       jnp.sum(B_ * B_, axis=1))
                return jax.lax.while_loop(
                    lambda s: s[0] < M, body, st0)

            _c[("T", M)] = jax.jit(run)
        float(jnp.sum(_c[("T", M)](BT)[1]))

    for _ in range(2):
        timeit("pcg_now ", run_now)
        timeit("apply   ", run_apply)
        timeit("pcg_T   ", run_T)
    print("PCG T DONE")
