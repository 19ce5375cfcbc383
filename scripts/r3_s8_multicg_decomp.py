#!/usr/bin/env python
"""Decompose the multi-RHS CG iteration at L=16 vs L=32 (lap3d-32 fp32
DIA plan closed over): spmm alone scales linearly with L, yet the full
CG body costs 10.6 (L=16) vs 104.8 (L=32) us/iter. Incremental bodies:
  spmm      - AP = A P (feedback)
  +dots     - + dot_multiple(P, AP), dot_multiple(R, R)
  +axpys    - + the three axpy/update ops
  +mask     - + converged-lane masking & where()s (full CG minus hist)
  full      - cg_solve_multi internals (history on)
"""

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix, spmm  # noqa: E402
from tpusparse.ops.blas import (  # noqa: E402
    axpy_multiple,
    dot_multiple,
    update_p_multiple,
)
from tpusparse.solvers.cg import cg_solve_multi  # noqa: E402

_compiled = {}


def timeit(name, make_run):
    outs = []
    for _ in range(2):
        st = iter_slope(make_run, iters=(20, 420), sets=1, reps=3)
        outs.append(st.median_s)
    print(f"{name}: {min(outs)*1e6:.2f} us/iter")


def variants(A, B, L):
    n = B.shape[0]

    def v_spmm(M):
        key = ("spmm", L, M)
        if key not in _compiled:
            def body(i, P):
                AP = spmm(A, P)
                return AP * 1e-3 + P
            _compiled[key] = jax.jit(
                lambda B_: jax.lax.fori_loop(0, M, body, B_))
        float(jnp.sum(_compiled[key](B)))

    def v_dots(M):
        key = ("dots", L, M)
        if key not in _compiled:
            def body(i, s):
                P, acc = s
                AP = spmm(A, P)
                d1 = dot_multiple(P, AP)
                P2 = AP * 1e-3 + P
                d2 = dot_multiple(P2, P2)
                return (P2, acc + d1 + d2)
            _compiled[key] = jax.jit(lambda B_: jax.lax.fori_loop(
                0, M, body, (B_, jnp.zeros((L,), B_.dtype))))
        float(jnp.sum(_compiled[key](B)[0]))

    def v_axpys(M):
        key = ("axpys", L, M)
        if key not in _compiled:
            def body(i, s):
                X, R, P = s
                AP = spmm(A, P)
                pAp = dot_multiple(P, AP)
                alpha = 1e-3 / (pAp + 1.0)
                X = axpy_multiple(X, alpha, P)
                R = axpy_multiple(R, -alpha, AP)
                rs = dot_multiple(R, R)
                beta = rs / (rs + 1.0)
                P = update_p_multiple(R, beta, P)
                return (X, R, P)
            _compiled[key] = jax.jit(lambda B_: jax.lax.fori_loop(
                0, M, body, (jnp.zeros_like(B_), B_, B_)))
        float(jnp.sum(_compiled[key](B)[0]))

    def v_full(M):
        key = ("full", L, M)
        if key not in _compiled:
            _compiled[key] = jax.jit(lambda B_: cg_solve_multi(
                A, B_, max_iters=M, tolerance=0.0))
        float(jnp.sum(_compiled[key](B).x))

    def v_nohist(M):
        key = ("nohist", L, M)
        if key not in _compiled:
            _compiled[key] = jax.jit(lambda B_: cg_solve_multi(
                A, B_, max_iters=M, tolerance=0.0,
                record_history=False))
        float(jnp.sum(_compiled[key](B).x))

    return [("spmm  ", v_spmm), ("+dots ", v_dots),
            ("+axpys", v_axpys), ("nohist", v_nohist),
            ("full  ", v_full)]


if __name__ == "__main__":
    csr = generators.make_laplacian_grid3d(32, dtype=np.float32).to_csr()
    rng = np.random.default_rng(0)
    n = csr.num_rows
    for L in (16, 32):
        A = plan_matrix(csr, dtype=np.float32, L=L)
        B = jnp.asarray(rng.standard_normal((n, L)).astype(np.float32))
        print(f"--- L={L}")
        for _ in range(2):
            for name, run in variants(A, B, L):
                timeit(name, run)
    print("DECOMP DONE")
