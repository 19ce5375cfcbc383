#!/usr/bin/env bash
# Round-3 session-4 on-chip A/Bs:
#   H. fp64 multi-RHS SpMM — df-ELL vs the new in-kernel df merge SpMM
#      (kernels/merge_df._spmm_kernel_df) on a stencil (ELL packing
#      holds) and on R-MAT skew (df-ELL job count explodes); validates
#      the DF_ELL_MIN_OCC AUTO gate.
#   I. wheel-500k AUTO(hybrid-dia) vs merge, interleaved — the greedy
#      partitions lifted merge on the wheel; decides the hybrid gate.
# Run from the repo root; appends to $OUT (default /tmp/r3_s4_ab.log).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r3_s4_ab.log}
R() { echo "== $*" >> "$OUT"; timeout 1200 "$@" >> "$OUT" 2>&1; }

: > "$OUT"

# --- H. fp64 multi-RHS SpMM A/B ---
R python - <<'EOF'
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.bench.timing import slope_time
from tpusparse.formats.ell import ell_occupancy_estimate
from tpusparse.io import generators
from tpusparse.kernels import ell_df
from tpusparse.kernels.merge_df import to_device_tiles_df, spmm_merge_df
from tpusparse.ops.spmv import _host_merge_tiles, plan_matrix, spmm

rng = np.random.default_rng(0)
for name, csr in [
    ("lap3d-32", generators.make_laplacian_grid3d(32, dtype=np.float64).to_csr()),
    ("rmat-14", generators.make_rmat(14, edge_factor=32, seed=1, dtype=np.float64).to_csr()),
]:
    occ = ell_occupancy_estimate(csr, ell_df.DF_JOBS_PER_TILE)
    L = 16
    X = jnp.asarray(rng.standard_normal((csr.num_cols, L)))
    plans = {
        "df-ell": ell_df.to_device_ell_df(ell_df.build_df_tiles(csr)),
        "df-merge": to_device_tiles_df(_host_merge_tiles(csr)),
    }
    auto = type(plan_matrix(csr, dtype=np.float64, L=L)).__name__
    S = csr.to_scipy()
    ref = S @ np.asarray(X)
    for p in range(3):
        for k, A in plans.items():
            Y = spmm(A, X)
            err = float(np.abs(np.asarray(Y) - ref).max() / np.abs(ref).max())
            st = slope_time(lambda v, A=A: spmm(A, v), X,
                            iters=(10, 110), sets=2, reps=3,
                            min_per_op=20e-6)
            gf = 2.0 * csr.nnz * L / st.median_s / 1e9
            print(f"pass{p} fp64 SpMM {name} L={L} occ={occ:.3f} "
                  f"auto={auto} [{k}]: {gf:.1f} GF "
                  f"(spread {st.spread:.3f}, err {err:.1e})")
EOF

# --- I. wheel-500k AUTO(hybrid) vs merge interleaved ---
R python - <<'EOF'
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.ops.spmv import plan_matrix, spmv

csr = generators.make_wheel(500000, dtype=np.float32).to_csr()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(csr.num_cols).astype(np.float32))
plans = {"auto": plan_matrix(csr, dtype=np.float32),
         "merge": plan_matrix(csr, strategy="merge", dtype=np.float32)}
for p in range(3):
    for k, A in plans.items():
        st = slope_time(lambda v, A=A: spmv(A, v), x, iters=(20, 420),
                        sets=2, reps=3, min_per_op=20e-6)
        gf = 2.0 * csr.nnz / st.median_s / 1e9
        print(f"pass{p} wheel-500k fp32 [{k}:{type(A).__name__}]: "
              f"{gf:.1f} GF (spread {st.spread:.3f})")
EOF

echo "AB DONE" >> "$OUT"
