#!/usr/bin/env bash
# Round-3 RESULTS refresh battery — realistic-matrix SpMV sweeps, the
# multi-RHS CG strategy table (replaces the unreproduced round-1 row),
# and clean-chip SpMM/BSR re-measures with spreads.
# Run from the repo root; appends to $OUT (default /tmp/r3_battery2.log).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/r3_battery2.log}
R() { echo "== $*" >> "$OUT"; timeout 900 "$@" >> "$OUT" 2>&1; }

: > "$OUT"

# --- A. SpMV realistic sweep (AUTO + per-strategy rows) ---
R python -m tpusparse.bench.run spmv --lap3d 48 --fp32
R python -m tpusparse.bench.run spmv --rmat 14 --fp32
R python -m tpusparse.bench.run spmv --rmat 16 --fp32 --strategy auto
R python -m tpusparse.bench.run spmv --rmat 16 --fp32 --strategy merge
R python -m tpusparse.bench.run spmv --wheel 500000 --fp32 --strategy auto
R python -m tpusparse.bench.run spmv --wheel 500000 --fp32 --strategy merge
R python -m tpusparse.bench.run spmv --lap2d 512 --fp32 --strategy auto
R python -m tpusparse.bench.run spmv --lap2d 512 --fp32 --strategy merge
# fp64 default mode on a realistic pattern + the stencil
R python -m tpusparse.bench.run spmv --rmat 14
R python -m tpusparse.bench.run spmv --lap3d 48

# --- B. Multi-RHS CG strategy table (round-2 methodology) ---
R python - <<'EOF'
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.io import generators
from tpusparse.ops.spmv import plan_matrix
from tpusparse.solvers.cg import cg_solve_multi

csr = generators.make_laplacian_grid3d(32, dtype=np.float32).to_csr()
L = 16
rng = np.random.default_rng(0)
B = jnp.asarray(rng.standard_normal((csr.num_rows, L)).astype(np.float32))
for strat in ("auto", "row_split", "merge", "reference"):
    A = plan_matrix(csr, strategy=strat, dtype=np.float32, L=L)
    kind = type(A).__name__
    res = cg_solve_multi(A, B, max_iters=2000, tolerance=1e-5)
    float(jnp.sum(res.x))  # warm + compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = cg_solve_multi(A, B, max_iters=2000, tolerance=1e-5)
        float(jnp.sum(res.x))
        ts.append(time.perf_counter() - t0)
    t = min(ts); it = int(res.iterations)
    gf = (2.0*csr.nnz + 10.0*csr.num_rows) * L * it / t / 1e9
    print(f"multiCG lap3d-32 L={L} [{strat}:{kind}]: {it} iters, "
          f"{t*1e3:.1f} ms, {gf:.1f} GF")
EOF

# --- C. SpMM lane sweep + BSR, spreads (clean-chip re-measure) ---
R python - <<'EOF'
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.ops.spmv import plan_matrix, spmm

csr = generators.make_laplacian_grid3d(32, dtype=np.float32).to_csr()
rng = np.random.default_rng(0)
for L in (32, 64, 128, 256):
    X = jnp.asarray(rng.standard_normal((csr.num_cols, L)).astype(np.float32))
    A = plan_matrix(csr, strategy="row_split", dtype=np.float32, L=L)
    st = slope_time(lambda v: spmm(A, v), X, iters=(10, 110), sets=5,
                    reps=3, min_per_op=20e-6)
    gf = 2.0*csr.nnz*L/st.median_s/1e9
    print(f"ELL SpMM lap3d-32 L={L}: {gf:.0f} GF (spread {st.spread:.3f})")

from tpusparse.io.generators import make_block_random
csrb = make_block_random(256, 6).to_csr()
X = jnp.asarray(rng.standard_normal((csrb.num_cols, 32)).astype(np.float32))
A = plan_matrix(csrb, strategy="bsr", dtype=np.float32, L=32)
st = slope_time(lambda v: spmm(A, v), X, iters=(10, 110), sets=5,
                reps=3, min_per_op=20e-6)
gf = 2.0*csrb.nnz*32/st.median_s/1e9
print(f"BSR SpMM block256x6 L=32: {gf:.0f} GF (spread {st.spread:.3f})")
EOF

# --- D. Scattered multi-RHS SpMM: ELL (occ ~0.05) vs merge-greedy ---
# AUTO routes occ < 0.35 to merge; this records the honest A/B behind
# that gate on power-law patterns.
R python - <<'EOF'
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.ops.spmv import plan_matrix, spmm

for scale in (14, 16):
    csr = generators.make_rmat(scale, edge_factor=32, seed=1).to_csr()
    rng = np.random.default_rng(0)
    L = 32
    X = jnp.asarray(rng.standard_normal((csr.num_cols, L)).astype(np.float32))
    for strat in ("merge", "row_split", "auto"):
        A = plan_matrix(csr, strategy=strat, dtype=np.float32, L=L)
        st = slope_time(lambda v: spmm(A, v), X, iters=(10, 110),
                        sets=5, reps=3, min_per_op=20e-6)
        gf = 2.0*csr.nnz*L/st.median_s/1e9
        print(f"SpMM rmat-{scale} L={L} [{strat}:{type(A).__name__}]: "
              f"{gf:.1f} GF (spread {st.spread:.3f})")
EOF

# --- E. Merge SpMM partition A/B on rmat-16: classic vs greedy ---
R python - <<'EOF'
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.bench.timing import slope_time
from tpusparse.formats.tiles import (build_merge_tiles, choose_partition,
                                     choose_tiling)
from tpusparse.io import generators
from tpusparse.kernels.merge_spmv import to_device_tiles
from tpusparse.kernels.spmm_merge import spmm_merge

csr = generators.make_rmat(16, edge_factor=32, seed=1).to_csr()
wr, wc = choose_tiling(csr)
tc = build_merge_tiles(csr, row_window=wr, col_window=wc)
tg = choose_partition(csr)
L = 32
rng = np.random.default_rng(0)
X = jnp.asarray(rng.standard_normal((csr.num_cols, L)).astype(np.float32))
plans = {f"classic occ={tc.occupancy:.2f}": to_device_tiles(tc, dtype=np.float32),
         f"chooser occ={tg.occupancy:.2f}": to_device_tiles(tg, dtype=np.float32)}
for p in range(3):  # interleaved passes
    for k, A in plans.items():
        st = slope_time(lambda v, A=A: spmm_merge(A, v), X,
                        iters=(10, 110), sets=2, reps=3, min_per_op=20e-6)
        gf = 2.0*csr.nnz*L/st.median_s/1e9
        print(f"pass{p} spmm_merge rmat-16 L=32 [{k}]: {gf:.1f} GF "
              f"(spread {st.spread:.3f})")
EOF

# --- F. RCM reorder A/B: scrambled-banded SpMV, interleaved ---
R python - <<'EOF'
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_enable_x64', True)
from tpusparse.bench.timing import slope_time
from tpusparse.io import generators
from tpusparse.ops.reorder import permute_symmetric
from tpusparse.ops.spmv import plan_matrix, spmv

csr0 = generators.make_laplacian_grid3d(48, dtype=np.float64).to_csr()
scram = np.random.default_rng(11).permutation(csr0.num_rows)
scr = permute_symmetric(csr0, scram)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(scr.num_cols).astype(np.float32))
plans = {"native-order": plan_matrix(scr, dtype=np.float32),
         "rcm": plan_matrix(scr, dtype=np.float32, reorder="rcm")}
for p in range(3):
    for k, A in plans.items():
        st = slope_time(lambda v, A=A: spmv(A, v), x, iters=(10, 110),
                        sets=2, reps=3, min_per_op=20e-6)
        gf = 2.0*scr.nnz/st.median_s/1e9
        print(f"pass{p} scrambled-lap3d-48 fp32 [{k}]: {gf:.1f} GF "
              f"(spread {st.spread:.3f})")
EOF

# --- G. Multi-RHS stencil SpMM at scale: DIA vs ELL at L=32 ---
# open question: _try_plan_dia returns XLA DIA for L>1 at any plane
# size; past the fusion collapse ELL may win. Decides an L-aware gate.
R python -m tpusparse.bench.run spmm --lap3d 96 --fp32 --strategy dia
R python -m tpusparse.bench.run spmm --lap3d 96 --fp32 --strategy row_split
R python -m tpusparse.bench.run spmm --lap3d 160 --fp32 --strategy dia
R python -m tpusparse.bench.run spmm --lap3d 160 --fp32 --strategy row_split

echo "BATTERY DONE" >> "$OUT"
