#!/usr/bin/env bash
# Round-3 session-6 on-chip A/Bs:
#   N. RCM secondary-gate validation on sparse R-MAT (edge factor 4):
#      the new mean-bandwidth + chooser-score path fires where the max-
#      bandwidth gate can't (hub rows pin the max). Kernel-space A/B —
#      natural-order plan vs RCM-permuted-space plan, interleaved, no
#      per-call permutes (the amortized operating point solvers see).
#   O. Solver device rates with the memoized-jit fix (--device_rate
#      previously re-traced a fresh closure per rep: SPAI rows read
#      pure compile noise).
# Run from the repo root; appends to $OUT (default /tmp/r3_s6_ab.log).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r3_s6_ab.log}
R() { echo "== $*" >> "$OUT"; timeout 1800 "$@" >> "$OUT" 2>&1; }

: > "$OUT"

# --- N. R-MAT secondary-gate kernel-space A/B (interleaved) ---
R python - <<'EOF'
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.ops.reorder import rcm_order, permute_symmetric, plan_reorder
from tpusparse.ops.spmv import plan_matrix, spmv
from tpusparse.formats.tiles import choose_partition_params

for scale, ef in ((16, 4), (14, 4)):
    csr = generators.make_rmat(scale, edge_factor=ef, seed=1).to_csr()
    perm = rcm_order(csr)
    csr_p = permute_symmetric(csr, perm)
    f0, s0 = choose_partition_params(csr, return_score=True)
    f1, s1 = choose_partition_params(csr_p, return_score=True)
    auto = plan_reorder(csr, dtype=np.float32)
    print(f"rmat-{scale}/ef{ef}: n={csr.num_rows} nnz={csr.nnz} "
          f"score {s0:.4f}->{s1:.4f} ({s1/max(s0,1e-12):.2f}x) "
          f"fam {f0[0]}->{f1[0]} auto={type(auto).__name__}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(csr.num_cols).astype(np.float32))
    plans = {"natural": plan_matrix(csr, dtype=np.float32),
             "rcm-space": plan_matrix(csr_p, dtype=np.float32)}
    for p in range(3):
        for k, A in plans.items():
            st = slope_time(lambda v, A=A: spmv(A, v), x,
                            iters=(20, 420), sets=2, reps=3,
                            min_per_op=20e-6)
            gf = 2.0 * csr.nnz / st.median_s / 1e9
            print(f"pass{p} rmat-{scale}/ef{ef} fp32 [{k}]: {gf:.1f} GF "
                  f"(spread {st.spread:.3f})")
EOF

# --- O. Solver device rates, memoized jit ---
R python -m tpusparse.bench.run cg --lap3d 32 --max_iters 200 --device_rate
R python -m tpusparse.bench.run multicg --lap2d 64 --num_vectors 4 \
    --max_iters 300 --device_rate

echo "AB DONE" >> "$OUT"
