#!/usr/bin/env python
"""Hybrid-remainder SpMM strategy A/B: the band+noise fixture's
remainder (ultra-sparse uniform scatter, ~0.2 nnz/row) measured 50
ms/iter inside CG at L=32 — which strategy should AUTO route such
leftovers to? Times spmm(rest, X) per strategy at L=32."""

import functools
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from tpusparse.formats.csr import CsrMatrix
from tpusparse.ops.spmv import plan_matrix, spmm

N = 262144
L = 32
M_NOISE = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000


def build_rest():
    rng = np.random.default_rng(7)
    r = rng.integers(0, N, M_NOISE)
    c = rng.integers(0, N, M_NOISE)
    v = rng.random(M_NOISE)
    Nz = sp.coo_matrix((v, (r, c)), shape=(N, N)).tocsr()
    S = (0.1 * (Nz + Nz.T)).tocsr().astype(np.float32)
    S.eliminate_zeros()
    return CsrMatrix.from_scipy(S)


def rate(tag, A, X, nnz, iters=(10, 110)):
    @functools.partial(jax.jit, static_argnums=2)
    def chain(Aa, X0, M):
        def body(_, Xc):
            Y = spmm(Aa, Xc)
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, X0)

    K1, K2 = iters

    def run(M):
        float(jnp.sum(chain(A, X, M)))

    try:
        run(K1), run(K2)
    except Exception as e:
        print(f"  {tag}: ERROR {type(e).__name__}: {e}", flush=True)
        return

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(3))
    t2 = min(t(K2) for _ in range(3))
    per = max((t2 - t1) / (K2 - K1), 1e-9)
    gf = 2.0 * nnz * L / per / 1e9
    print(f"  {tag}: {per*1e6:.1f} us/spmm, {gf:.2f} GF", flush=True)


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    csr = build_rest()
    print(f"rest: n={csr.num_rows} nnz={csr.nnz} "
          f"({csr.nnz/csr.num_rows:.2f}/row)", flush=True)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, L)).astype(np.float32))
    for strat in ("auto", "merge", "row_split", "bcoo", "reference"):
        try:
            A = plan_matrix(csr, strategy=strat, dtype=np.float32, L=L)
        except Exception as e:
            print(f"  {strat}: PLAN ERROR {e}", flush=True)
            continue
        rate(f"{strat} ({type(A).__name__})", A, X, csr.nnz)
    print("REST STRATEGIES DONE", flush=True)
