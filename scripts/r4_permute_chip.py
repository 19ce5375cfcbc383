#!/usr/bin/env python
"""On-chip A/B: Pallas permute kernel vs XLA element gather, plus the
per-call reordered-SpMV comparison on the sparse power-law class
(RESULTS.md round-4 "Pallas permutation kernel"). Same process,
interleaved passes."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax.numpy as jnp
from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.kernels.permute import build_permute_plan, permute_apply
from tpusparse.ops.reorder import degree_order, plan_reorder
from tpusparse.ops.spmv import plan_matrix, spmv

csr = generators.make_rmat(16, edge_factor=4, seed=1).to_csr()
n = csr.num_cols
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

perms = {"degree": degree_order(csr), "random": rng.permutation(n)}
for tag, p in perms.items():
    P = build_permute_plan(p)
    pd = jnp.asarray(p.astype(np.int32))
    y = np.asarray(permute_apply(P, x))
    exact = bool(np.array_equal(y, np.asarray(x)[p]))
    st_k = slope_time(lambda w: permute_apply(P, w), x, iters=(40, 840), sets=4, reps=3)
    st_x = slope_time(lambda w: w[pd], x, iters=(20, 420), sets=4, reps=3)
    print(f"perm {tag:7s} nsub {P.nsub:5d} kernel {st_k.min_s*1e6:7.1f} us ({n/st_k.min_s/1e9:.2f} Ge/s) "
          f"xla {st_x.min_s*1e6:7.1f} us ({n/st_x.min_s/1e9:.3f} Ge/s) exact {exact} "
          f"spreads {st_k.spread:.3f}/{st_x.spread:.3f}", flush=True)

ref = csr.to_scipy() @ np.asarray(x)
plans = {"natural": plan_matrix(csr, strategy="merge", dtype=np.float32),
         "reordered": plan_reorder(csr, strategy="merge", dtype=np.float32, order="degree")}
for _p in range(2):
    for tag, A in plans.items():
        y = np.asarray(spmv(A, x))
        err = np.abs(y - ref).max() / (np.abs(ref).max() + 1)
        st = slope_time(lambda w, A=A: spmv(A, w), x, iters=(20, 420), sets=4, reps=3)
        gf = 2 * csr.nnz / st.min_s / 1e9
        print(f"percall {tag:10s} {st.min_s*1e6:8.1f} us {gf:6.1f} GF err {err:.1e} spread {st.spread:.3f}", flush=True)
