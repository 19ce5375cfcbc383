#!/usr/bin/env python
"""Solver-level A/B: CG on the sparse power-law SPD class, natural vs
reorder='auto' (the permuted-space fast path).

The round-4 inner A/B measured degree-sort 2.15x / RCM 1.8x on the
rmat-ef4 gather kernel IN PERMUTED SPACE — which is exactly the
solver fast path's per-iteration regime (one permute of b in, one of
x out, `solvers/cg._cg_solve_impl`). This script checks the win
survives the CG loop (BLAS-1 is order-invariant, so the SpMV share
sets the ceiling). Same process, interleaved passes, pinned-trip
slope at tolerance=0.
"""

import os
import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.ops.spmv import plan_matrix, plan_kind
from tpusparse.solvers.cg import cg_solve


def main():
    csr = generators.make_rmat_spd(15, edge_factor=4,
                                   dtype=np.float32).to_csr()
    print(f"rmat_spd_15_ef4 n={csr.num_rows} nnz={csr.nnz}", flush=True)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(
        csr.num_rows).astype(np.float32))
    plans = {
        "natural": plan_matrix(csr, strategy="merge", dtype=np.float32),
        "auto": plan_matrix(csr, strategy="merge", dtype=np.float32,
                            reorder="auto"),
    }
    S = csr.to_scipy()
    ITERS = 40
    for _pass in range(2):
        for tag, A in plans.items():
            res = cg_solve(A, b, max_iters=400, tolerance=1e-5)
            x = np.asarray(res.x, dtype=np.float64)
            rel = (np.linalg.norm(np.asarray(b) - S @ x)
                   / np.linalg.norm(np.asarray(b)))
            # pinned-trip timing: tolerance=0 runs exactly max_iters
            st = slope_time(
                lambda w: cg_solve(A, w, max_iters=ITERS,
                                   tolerance=0.0).x,
                b, iters=(2, 12), sets=4, reps=3)
            per_it = st.min_s / ITERS
            gf = (2 * csr.nnz + 10 * csr.num_rows) / per_it / 1e9
            print(f"{tag:8s} {plan_kind(A):14s} iters={int(res.iterations)}"
                  f" rel={rel:.1e}  {per_it*1e6:8.1f} us/iter "
                  f"{gf:6.1f} GF  spread {st.spread:.3f}", flush=True)


if __name__ == "__main__":
    main()
