#!/usr/bin/env python
"""A/B: MXU prefix-scan pass count (HIGHEST=6 vs DEFAULT=1) in merge SpMV.

The round-4 ablation put the scan at 19.8% of the lap3d-48 merge row
(and the measured per-step matmul cost exactly at the 6-pass MXU
floor). Mosaic's in-kernel dot lowering supports ONLY DEFAULT and
HIGHEST (``Precision.HIGH`` raises NotImplementedError), so the only
cheaper option is the single bf16 pass. Measured verdict (RESULTS.md):
DEFAULT is 1.44x faster on the lap3d-48 row (40.2 vs 57.7 us) but its
error (9.2e-03) is three orders outside the f32 golden contract —
HIGHEST stays the production setting; this script reproduces both
rows. Same process, interleaved passes; max relative error vs scipy
fp64 printed per pass.
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
        ref = csr.to_scipy() @ np.asarray(x, dtype=np.float64)
        scale = np.abs(ref).max()
        for prec in (jax.lax.Precision.HIGHEST,
                     jax.lax.Precision.DEFAULT,
                     jax.lax.Precision.HIGHEST,
                     jax.lax.Precision.DEFAULT):
            M.SCAN_PRECISION = prec
            jax.clear_caches()
            A = plan_matrix(csr, strategy="merge", dtype=np.float32)
            y = np.asarray(spmv(A, x))
            err = np.abs(y - ref).max() / scale
            st = slope_time(lambda w: spmv(A, w), x, iters=(20, 420),
                            sets=4, reps=3)
            gf = 2 * csr.nnz / st.min_s / 1e9
            tag = ("hi6" if prec == jax.lax.Precision.HIGHEST
                   else "def1")
            print(f"{name:9s} {tag}  {st.min_s*1e6:8.1f} us  "
                  f"{gf:6.1f} GF  err {err:.2e}  "
                  f"spread {st.spread:.3f}", flush=True)
    M.SCAN_PRECISION = jax.lax.Precision.HIGHEST


if __name__ == "__main__":
    main()
