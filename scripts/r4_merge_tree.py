#!/usr/bin/env python
"""A/B: select-tree vs select-loop gather in the merge SpMV kernel.

Same plan, same process, interleaved passes (shared-chip rule). The
tree replaces the select-loop's S compares + S selects with S-1
selects + 2*log2(S) mask ops (kernels/merge_spmv._select_tree) —
expected ~10-15% of the gather stage at spans >= 8, a wash at small
spans. Fixtures: rmat-16 (high span, gather-dominated) and lap3d-48
(the bench merge row, spans 2-8).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.kernels import merge_spmv as M
from tpusparse.ops.spmv import plan_matrix, spmv


def main():
    fixtures = {
        "lap3d_48": generators.make_laplacian_grid3d(
            48, dtype=np.float32).to_csr(),
        "rmat_16": generators.make_rmat(16, dtype=np.float32).to_csr(),
    }
    for name, csr in fixtures.items():
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            csr.num_cols).astype(np.float32))
        ref = csr.to_scipy() @ np.asarray(x)
        for tree in (False, True, False, True):  # interleaved
            M.GATHER_TREE = tree
            jax.clear_caches()
            A = plan_matrix(csr, strategy="merge", dtype=np.float32)
            y = np.asarray(spmv(A, x))
            err = np.abs(y - ref).max() / (np.abs(ref).max() + 1)
            st = slope_time(lambda w: spmv(A, w), x, iters=(20, 420),
                            sets=4, reps=3)
            gf = 2 * csr.nnz / st.min_s / 1e9
            print(f"{name:9s} {'tree' if tree else 'loop'}  "
                  f"{st.min_s*1e6:8.1f} us  {gf:6.1f} GF  err {err:.1e}"
                  f"  spread {st.spread:.3f}", flush=True)
    M.GATHER_TREE = False


if __name__ == "__main__":
    main()
