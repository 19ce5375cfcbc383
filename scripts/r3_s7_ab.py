#!/usr/bin/env python
"""Round-3 session-7 on-chip A/B: fp64 CG device rate with compensated
double-float dot reductions (ops.blas.df_sum) vs strict-IEEE XLA f64
reductions.

Motivation (measured, session 7): one emulated-f64 32k dot costs
~219 us on v5e vs ~2 us fp32 — ~82%% of an fp64 CG iteration — while
f64 *elementwise* ops are only ~3x fp32. df_sum reduces in two-f32
double-float pairwise arithmetic (~60x on the isolated dot). This A/B
measures the end effect on the fp64 solver device rate.

Methodology (CLAUDE.md): one process, interleaved passes, iteration
slope with tolerance=0 pinning the trip count (iter_slope). The
F64_COMPENSATED_DOT flag is read at trace time, so each (flag, M)
pair jits a FRESH closure, memoized so repeat timings hit the cache.

FLOP models (reference parity, cpu_multicg.cpp:176): CG single-RHS
(2 nnz + 10 n)/iter; multi-RHS x L.
"""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops import blas  # noqa: E402
from tpusparse.ops.spmv import plan_matrix  # noqa: E402
from tpusparse.solvers.cg import (  # noqa: E402
    _cg_solve_impl,
    _cg_solve_multi_impl,
)

_compiled = {}


def _get(flag, M, multi, A):
    key = (flag, M, multi)
    if key not in _compiled:
        blas.F64_COMPENSATED_DOT = flag
        if multi:
            f = jax.jit(lambda A_, B_: _cg_solve_multi_impl(
                A_, B_, M, 0.0, "auto", None, False))
        else:
            f = jax.jit(lambda A_, b_: _cg_solve_impl(
                A_, b_, M, 0.0, "auto", None, None, False))
        _compiled[key] = f
    return _compiled[key]


def run_case(name, csr, L, nnz, n, passes=3):
    A = plan_matrix(csr, dtype=np.float64)
    print(f"{name}: n={n} nnz={nnz} L={L} plan={type(A).__name__}")
    rng = np.random.default_rng(0)
    shape = (n,) if L == 1 else (n, L)
    b = jnp.asarray(rng.standard_normal(shape))
    multi = L > 1
    flops_iter = (2.0 * nnz + 10.0 * n) * L

    def make_run(flag):
        def run(M):
            res = _get(flag, M, multi, A)(A, b)
            float(jnp.sum(res.x))  # sync (block_until_ready lies here)
        return run

    runs = {"strict-f64": make_run(False), "df-dot": make_run(True)}
    for p in range(passes):
        for k, run in runs.items():
            st = iter_slope(run, iters=(20, 420), sets=1, reps=3)
            us = st.median_s * 1e6
            gf = flops_iter / st.median_s / 1e9
            print(f"pass{p} {name} fp64 [{k}]: {us:.1f} us/iter, "
                  f"{gf:.2f} GF (spread {st.spread:.3f})")


def check_equivalence():
    """Same solve through both flags: iteration counts must match and
    both solutions meet the tolerance (accuracy is NOT traded away)."""
    csr = generators.make_laplacian_grid3d(16).to_csr()
    A = plan_matrix(csr, dtype=np.float64)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(csr.num_rows))
    outs = {}
    for flag in (False, True):
        blas.F64_COMPENSATED_DOT = flag
        f = jax.jit(lambda A_, b_: _cg_solve_impl(
            A_, b_, 2000, 1e-10, "auto", None, None, False))
        r = f(A, b)
        outs[flag] = (int(r.iterations), float(r.residual))
    i0, r0 = outs[False]
    i1, r1 = outs[True]
    print(f"equivalence lap3d-16 tol=1e-10: strict iters={i0} "
          f"rel={r0:.2e} | df iters={i1} rel={r1:.2e} "
          f"(delta_iters={abs(i0 - i1)})")
    assert abs(i0 - i1) <= 2 and r0 < 1e-10 and r1 < 1e-10


if __name__ == "__main__":
    check_equivalence()
    c3 = generators.make_laplacian_grid3d(32).to_csr()
    run_case("lap3d-32", c3, 1, c3.nnz, c3.num_rows)
    cr = generators.make_rmat_spd(14, seed=1).to_csr()
    run_case("rmat_spd-14", cr, 1, cr.nnz, cr.num_rows)
    c2 = generators.make_laplacian_grid2d(64).to_csr()
    run_case("lap2d-64 L=4", c2, 4, c2.nnz, c2.num_rows)
    print("AB DONE")
