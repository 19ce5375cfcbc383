#!/usr/bin/env python
"""Round-3 session-7 study: PCG-IC(0) Jacobi-sweep count trade-off.

At the default sweeps=16, one PCG iteration runs 32 tri-solve SpMMs:
lap2d-64/L4 measured 63.1 us/iter (session 6) vs plain CG's 10.2 —
PCG converged in 45 vs 151 iters yet LOST end-to-end (2.84 vs
1.54 ms device time). The truncated-Jacobi composite is A_f^T A_f
(symmetric PSD at any sweep count — the backward operator is exactly
the transpose of the forward one), so lowering sweeps is PCG-safe;
this study measures iters x device-rate across sweep counts to pick
the default.

Also: same-process A/B of record_history on/off in multiCG (the
session-6/7 cross-session comparison suggested history writes
triple tiny-solve iteration cost).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix  # noqa: E402
from tpusparse.precond.ic0 import ic0_factorize  # noqa: E402
from tpusparse.solvers.cg import cg_solve_multi  # noqa: E402
from tpusparse.solvers.pcg import (  # noqa: E402
    make_ic0_preconditioner,
    pcg_solve_multi,
)

_compiled = {}


def _jit(key, make):
    if key not in _compiled:
        _compiled[key] = make()
    return _compiled[key]


def study(name, csr, L, tol=1e-5):
    dtype = np.float32
    A = plan_matrix(csr, dtype=dtype, L=L)
    n, nnz = csr.num_rows, csr.nnz
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((n, L)).astype(dtype))
    Lfac = ic0_factorize(csr)
    flops_cg = (2.0 * nnz + 10.0 * n) * L
    flops_pcg = (2.0 * nnz + 4.0 * Lfac.nnz + 12.0 * n) * L

    # plain-CG baseline row (history on, reference parity)
    f = _jit((name, "cg"), lambda: jax.jit(
        lambda B_: cg_solve_multi(A, B_, max_iters=5000, tolerance=tol)))
    iters_cg = int(f(B).iterations)

    def run_cg(M):
        r = _jit((name, "cg", M), lambda: jax.jit(
            lambda B_: cg_solve_multi(A, B_, max_iters=M, tolerance=0.0,
                                      record_history=False)))(B)
        float(jnp.sum(r.x))

    st = iter_slope(run_cg, iters=(20, 420), sets=2, reps=3)
    t_cg = iters_cg * st.min_s * 1e3
    print(f"{name} L={L}: CG iters={iters_cg} "
          f"{st.min_s*1e6:.1f} us/iter -> {t_cg:.2f} ms device "
          f"({flops_cg / st.min_s / 1e9:.1f} GF)")

    for sweeps in (1, 2, 4, 8, 16):
        prec = make_ic0_preconditioner(Lfac, sweeps=sweeps, num_rhs=L,
                                       dtype=dtype)
        f = _jit((name, "pcg", sweeps), lambda: jax.jit(
            lambda B_: pcg_solve_multi(A, B_, prec, max_iters=5000,
                                       tolerance=tol)))
        res = f(B)
        iters = int(res.iterations)
        conv = bool(np.all(np.asarray(res.converged)))

        def run_pcg(M, prec=prec, sweeps=sweeps):
            r = _jit((name, "pcg", sweeps, M), lambda: jax.jit(
                lambda B_: pcg_solve_multi(A, B_, prec, max_iters=M,
                                           tolerance=0.0,
                                           record_history=False)))(B)
            float(jnp.sum(r.x))

        st = iter_slope(run_pcg, iters=(20, 420), sets=2, reps=3)
        t = iters * st.min_s * 1e3
        mark = " <-- beats CG" if conv and t < t_cg else ""
        print(f"{name} L={L}: PCG sweeps={sweeps} iters={iters} "
              f"conv={conv} {st.min_s*1e6:.1f} us/iter -> "
              f"{t:.2f} ms device "
              f"({flops_pcg / st.min_s / 1e9:.1f} GF){mark}")


def history_ab(name, csr, L):
    dtype = np.float32
    A = plan_matrix(csr, dtype=dtype, L=L)
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((csr.num_rows, L)).astype(dtype))
    out = {}
    for p in range(3):
        for rh in (True, False):
            def run(M, rh=rh):
                r = _jit((name, "hist", rh, M), lambda: jax.jit(
                    lambda B_: cg_solve_multi(
                        A, B_, max_iters=M, tolerance=0.0,
                        record_history=rh)))(B)
                float(jnp.sum(r.x))
            st = iter_slope(run, iters=(20, 420), sets=1, reps=3)
            out.setdefault(rh, []).append(st.median_s)
    h1, h0 = min(out[True]) * 1e6, min(out[False]) * 1e6
    print(f"{name} L={L} history A/B: on {h1:.2f} us/iter, "
          f"off {h0:.2f} us/iter ({h1 / h0:.2f}x)")


if __name__ == "__main__":
    study("lap2d-64", generators.make_laplacian_grid2d(
        64, dtype=np.float32).to_csr(), 4)
    study("lap2d-128", generators.make_laplacian_grid2d(
        128, dtype=np.float32).to_csr(), 16)
    study("lap3d-32", generators.make_laplacian_grid3d(
        32, dtype=np.float32).to_csr(), 16)
    history_ab("lap2d-64", generators.make_laplacian_grid2d(
        64, dtype=np.float32).to_csr(), 4)
    print("PCG SWEEPS DONE")
