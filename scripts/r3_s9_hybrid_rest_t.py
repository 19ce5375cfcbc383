#!/usr/bin/env python
"""A/B of the hybrid-with-remainder transposed fast path: band+noise
matrix (7-diag band at 75% of nnz + symmetric scattered noise), fp32
L=32. Old = generic (n, L) path (forced via a baked matmat closure so
both sides are apples-to-apples constant-plan executables), new = the
transposed (L, n) state with the remainder SpMM behind two boundary
transposes (_transposed_matmat_of on HybridPlan with rest)."""

import functools

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope
from tpusparse.formats.csr import CsrMatrix
from tpusparse.ops.hybrid import HybridPlan
from tpusparse.ops.spmv import plan_matrix, spmm
from tpusparse.solvers.cg import (
    _cg_solve_multi_impl,
    _transposed_matmat_of,
    cg_solve_multi,
)

import sys

N = 262144
L = 32
M_NOISE = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000


def build():
    diags = [0, -1, 1, -256, 256, -257, 257]
    vals = [8.0 * np.ones(N)] + [
        -0.5 * np.ones(N - abs(d)) for d in diags[1:]
    ]
    T = sp.diags(vals, diags, shape=(N, N), format="csr")
    rng = np.random.default_rng(7)
    m = M_NOISE  # scattered noise entries (duplicates just sum)
    r = rng.integers(0, N, m)
    c = rng.integers(0, N, m)
    v = rng.random(m).astype(np.float64)
    Nz = sp.coo_matrix((v, (r, c)), shape=(N, N)).tocsr()
    S = (T + 0.1 * (Nz + Nz.T)).tocsr().astype(np.float32)
    return CsrMatrix.from_scipy(S)


def rate(tag, fn, nnz, n, iters=(20, 220)):
    outs = []
    for _ in range(3):
        st = iter_slope(fn, iters=iters, sets=1, reps=3)
        outs.append(st.median_s)
    t = min(outs)
    gf = (2.0 * nnz + 10.0 * n) * L / t / 1e9
    print(f"  cg {tag}: {t*1e6:.1f} us/iter, {gf:.1f} GF", flush=True)
    return t


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    csr = build()
    n, nnz = csr.num_rows, csr.nnz
    A = plan_matrix(csr, dtype=np.float32, L=L)
    assert isinstance(A, HybridPlan) and A.rest is not None, type(A)
    assert _transposed_matmat_of(A) is not None
    rest_frac = 1.0 - (A.dia.data.size if hasattr(A.dia, "data")
                       else A.dia.data_b.size) / nnz
    print(f"band+noise: n={n} nnz={nnz} rest_frac~{rest_frac:.2f}",
        flush=True)
    rng = np.random.default_rng(0)
    B = jnp.asarray(rng.standard_normal((n, L)).astype(np.float32))

    workers = {}

    def old_run(M):
        fn = workers.get(("old", M))
        if fn is None:
            fn = jax.jit(lambda B_: _cg_solve_multi_impl(
                A, B_, M, 0.0, "auto",
                lambda V: spmm(A, V), False))
            workers[("old", M)] = fn
        float(jnp.sum(fn(B).x))

    def new_run(M):
        r = cg_solve_multi(A, B, max_iters=M, tolerance=0.0,
                           record_history=False)
        float(jnp.sum(r.x))

    for _ in range(2):
        rate("transposed(new)", new_run, nnz, n)
        rate("generic(old)", old_run, nnz, n)
    print("HYBRID REST T AB DONE", flush=True)
