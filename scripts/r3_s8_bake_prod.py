#!/usr/bin/env python
"""Production-path A/B of the baked CG dispatch (solvers.cg bake=):
lap3d-32 + lap3d-48 fp32 + lap3d-48 fp64, single-RHS device rate via
cg_solve(tolerance=0) pinned-trip slope, bake=False vs auto."""

import numpy as np

import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix  # noqa: E402
from tpusparse.solvers.cg import cg_solve  # noqa: E402


def rate(tag, A, b, nnz, n, bake):
    def run(M):
        r = cg_solve(A, b, max_iters=M, tolerance=0.0, bake=bake)
        float(jnp.sum(r.x))

    outs = []
    for _ in range(3):
        st = iter_slope(run, iters=(20, 420), sets=1, reps=3)
        outs.append(st.median_s)
    t = min(outs)
    gf = (2.0 * nnz + 10.0 * n) / t / 1e9
    print(f"{tag} bake={bake}: {t*1e6:.2f} us/iter, {gf:.1f} GF")
    return t


if __name__ == "__main__":
    import jax

    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(0)
    for name, k, dt in (("lap3d32-f32", 32, np.float32),
                        ("lap3d48-f32", 48, np.float32),
                        ("lap3d48-f64", 48, np.float64)):
        csr = generators.make_laplacian_grid3d(k, dtype=dt).to_csr()
        A = plan_matrix(csr, dtype=dt)
        b = jnp.asarray(rng.standard_normal(csr.num_rows).astype(dt))
        for _ in range(2):
            for bake in (False, None):
                rate(name, A, b, csr.nnz, csr.num_rows, bake)
    print("PROD AB DONE")
