#!/usr/bin/env python
"""A/B: natural vs RCM vs degree-sort ordering for gather-path SpMV.

Round-4 follow-up to the micro study: the merge kernel's gather stage
measured ~92% of the ISA floor (4.3 ns per select-loop window row), so
the remaining gather lever is shrinking the SPAN itself. Host
partition stats predicted (per-tile model: 62 ns fixed + 4.3 ns *
col_span): rmat-16 natural 284 us (measured 297), rcm 215, degree 195.

Same process, interleaved passes (shared-chip rule). Timed op is the
full spmv() on the ReorderedPlan — the per-call permutation gathers
(~0.65 us at 65k rows) are included, honest for the CLI row. err is
checked against scipy in ORIGINAL coordinates.
"""

import os
import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.ops.reorder import plan_reorder
from tpusparse.ops.spmv import plan_matrix, plan_kind, spmv


def main():
    fixtures = {
        "rmat_16": generators.make_rmat(16, dtype=np.float32).to_csr(),
        "rmat_14": generators.make_rmat(14, dtype=np.float32).to_csr(),
    }
    for name, csr in fixtures.items():
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            csr.num_cols).astype(np.float32))
        ref = csr.to_scipy() @ np.asarray(x)
        plans = {
            "natural": plan_matrix(csr, strategy="merge",
                                   dtype=np.float32),
            "rcm": plan_reorder(csr, strategy="merge",
                                dtype=np.float32, order="rcm"),
            "degree": plan_reorder(csr, strategy="merge",
                                   dtype=np.float32, order="degree"),
        }
        for _pass in range(2):  # interleaved passes
            for tag, A in plans.items():
                y = np.asarray(spmv(A, x))
                err = np.abs(y - ref).max() / (np.abs(ref).max() + 1)
                st = slope_time(lambda w, A=A: spmv(A, w), x,
                                iters=(20, 420), sets=4, reps=3)
                gf = 2 * csr.nnz / st.min_s / 1e9
                print(f"{name:8s} {tag:8s} {plan_kind(A):14s} "
                      f"{st.min_s*1e6:8.1f} us  {gf:6.1f} GF  "
                      f"err {err:.1e}  spread {st.spread:.3f}",
                      flush=True)


if __name__ == "__main__":
    main()
