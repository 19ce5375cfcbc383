#!/usr/bin/env bash
# Round-3 session-5 on-chip A/Bs:
#   K. FEM-class fixture (P1 stiffness on random Delaunay, the
#      SuiteSparse bcsstk class): strategy rows fp32+fp64.
#   L. RCM kernel-space A/B on the FEM matrix — natural-order plan vs
#      a plan built on the RCM-permuted matrix, both timed WITHOUT
#      per-call permutes (the amortized operating point solvers see).
#   M. FEM multiCG with/without --reorder rcm (solve-level value).
# Run from the repo root; appends to $OUT (default /tmp/r3_s5_ab2.log).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r3_s5_ab2.log}
R() { echo "== $*" >> "$OUT"; timeout 1800 "$@" >> "$OUT" 2>&1; }

: > "$OUT"

# --- K. FEM strategy rows ---
R python -m tpusparse.bench.run spmv --fem 500000 --fp32
R python -m tpusparse.bench.run spmv --fem 500000
R python -m tpusparse.bench.run spmm --fem 200000 --fp32

# --- L. RCM kernel-space A/B (interleaved, no per-call permutes) ---
R python - <<'EOF'
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.ops.reorder import rcm_order, permute_symmetric
from tpusparse.ops.spmv import plan_matrix, spmv

csr = generators.make_fem2d(500000, seed=2, dtype=np.float32).to_csr()
perm = rcm_order(csr)
csr_p = permute_symmetric(csr, perm)
coo0, coo1 = csr.to_scipy().tocoo(), csr_p.to_scipy().tocoo()
print("bandwidth natural", int(np.abs(coo0.row-coo0.col).max()),
      "rcm", int(np.abs(coo1.row-coo1.col).max()))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(csr.num_cols).astype(np.float32))
plans = {"natural": plan_matrix(csr, dtype=np.float32),
         "rcm-space": plan_matrix(csr_p, dtype=np.float32)}
for k, A in plans.items():
    print(k, "plan:", type(A).__name__)
for p in range(3):
    for k, A in plans.items():
        st = slope_time(lambda v, A=A: spmv(A, v), x, iters=(20, 420),
                        sets=2, reps=3, min_per_op=20e-6)
        gf = 2.0 * csr.nnz / st.median_s / 1e9
        print(f"pass{p} fem-500k fp32 [{k}]: {gf:.1f} GF "
              f"(spread {st.spread:.3f})")
EOF

# --- M. FEM solve-level reorder A/B ---
R python -m tpusparse.bench.run multicg --fem 100000 --max_iters 400
R python -m tpusparse.bench.run multicg --fem 100000 --max_iters 400 --reorder rcm

echo "AB DONE" >> "$OUT"
