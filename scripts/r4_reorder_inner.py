#!/usr/bin/env python
"""Decompose the reordered-SpMV A/B: inner kernel vs permutation cost.

The r4_reorder_ab.py result (natural 299 us vs reordered 1280 us on
rmat-16) is two XLA element-gathers at ~0.1 Gelem/s (~655 us each at
65k rows) burying the kernel. This script separates the terms, same
process:

  inner    — spmv on the permuted-space plan with pre-permuted x
             (the solver fast path's per-iteration cost)
  xla_perm — one XLA x[perm] gather at n elements
  mplan    — the same permutation executed as a merge-tile SpMV on a
             1-nnz-per-row permutation-matrix plan (occupancy-1 tiles;
             the kernel's select-loop IS a block-wise permute) — the
             candidate fast device permute primitive
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusparse.bench.timing import slope_time
from tpusparse.formats.coo import CooMatrix
from tpusparse.formats.csr import CsrMatrix
from tpusparse.io import generators
from tpusparse.ops.reorder import degree_order, permute_symmetric, rcm_order
from tpusparse.ops.spmv import plan_matrix, spmv


def perm_plan(perm):
    """Merge-tile plan computing x_p = x[perm] (permutation matrix)."""
    n = perm.size
    rows = np.arange(n, dtype=np.int64)
    vals = np.ones(n, dtype=np.float32)
    csr = CsrMatrix.from_coo(
        CooMatrix(n, n, rows, perm.astype(np.int64), vals))
    return plan_matrix(csr, strategy="merge", dtype=np.float32)


def main():
    csr = generators.make_rmat(16, dtype=np.float32).to_csr()
    n = csr.num_cols
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ref = csr.to_scipy() @ np.asarray(x)

    orders = {"rcm": rcm_order(csr), "degree": degree_order(csr)}
    plans = {"natural": (plan_matrix(csr, strategy="merge",
                                     dtype=np.float32), None)}
    for tag, p in orders.items():
        cp = permute_symmetric(csr, p)
        plans[tag] = (plan_matrix(cp, strategy="merge",
                                  dtype=np.float32), p)

    for _pass in range(2):
        for tag, (A, p) in plans.items():
            if p is None:
                xp = x
                refp = ref
            else:
                xp = jnp.asarray(np.asarray(x)[p])
                refp = (csr.to_scipy() @ np.asarray(x))[p]
            y = np.asarray(spmv(A, xp))
            err = np.abs(y - refp).max() / (np.abs(refp).max() + 1)
            st = slope_time(lambda w, A=A: spmv(A, w), xp,
                            iters=(20, 420), sets=4, reps=3)
            gf = 2 * csr.nnz / st.min_s / 1e9
            print(f"inner    {tag:8s} {st.min_s*1e6:8.1f} us "
                  f"{gf:6.1f} GF  err {err:.1e}  "
                  f"spread {st.spread:.3f}", flush=True)

    # permutation primitives
    p = orders["degree"]
    pd = jnp.asarray(p.astype(np.int32))
    st = slope_time(lambda w: w[pd], x, iters=(20, 420), sets=4, reps=3)
    print(f"xla_perm  n={n}  {st.min_s*1e6:8.1f} us  "
          f"({n/st.min_s/1e9:.4f} Gelem/s)  spread {st.spread:.3f}",
          flush=True)

    P = perm_plan(p)
    yp = np.asarray(spmv(P, x))
    err = np.abs(yp - np.asarray(x)[p]).max()
    st = slope_time(lambda w: spmv(P, w), x, iters=(20, 420),
                    sets=4, reps=3)
    print(f"mplan     n={n}  {st.min_s*1e6:8.1f} us  "
          f"({n/st.min_s/1e9:.4f} Gelem/s)  err {err:.1e}  "
          f"spread {st.spread:.3f}", flush=True)


if __name__ == "__main__":
    main()
