#!/usr/bin/env python
"""Round-3 session-7 A/B #3:

A. Lane-packed df tree (DF_PACK_LANES=512) vs the unpacked tree
   (=1) vs strict-IEEE f64 reductions, in the fp64 CG/multiCG device
   rate. The unpacked tree lost at L=4 (0.84-0.98x strict) because
   its (p, L) stages use L of 128 VPU lanes; packing folds G row
   groups into lanes.
B. Post-beta-guard fp32 single-RHS CG device rate on lap3d-32: the
   session-6 187.6 us/iter row was measured with the unguarded
   beta = rs_new/0 NaN-exit (loop died at iter ~285 regardless of
   max_iters), so its slope mixed a hard iteration ceiling into the
   chain delta — re-measure with the guard in place.
"""

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops import blas  # noqa: E402
from tpusparse.ops.spmv import plan_matrix  # noqa: E402
from tpusparse.solvers.cg import (  # noqa: E402
    _cg_solve_impl,
    _cg_solve_multi_impl,
)

_compiled = {}


def _get(variant, M, multi, key2):
    key = (variant, M, multi, key2)
    if key not in _compiled:
        if variant == "strict":
            blas.F64_COMPENSATED_DOT = False
        else:
            blas.F64_COMPENSATED_DOT = True
            blas.DF_PACK_LANES = 1 if variant == "df-unpacked" else 512
        if multi:
            f = jax.jit(lambda A_, B_: _cg_solve_multi_impl(
                A_, B_, M, 0.0, "auto", None, False))
        else:
            f = jax.jit(lambda A_, b_: _cg_solve_impl(
                A_, b_, M, 0.0, "auto", None, None, False))
        _compiled[key] = f
    return _compiled[key]


def case(name, csr, L, dtype=np.float64, passes=2,
         variants=("strict", "df-unpacked", "df-packed")):
    A = plan_matrix(csr, dtype=dtype)
    n, nnz = csr.num_rows, csr.nnz
    rng = np.random.default_rng(0)
    shape = (n,) if L == 1 else (n, L)
    b = jnp.asarray(rng.standard_normal(shape).astype(dtype))
    multi = L > 1
    flops_iter = (2.0 * nnz + 10.0 * n) * L
    out = {}
    for p in range(passes):
        for variant in variants:
            def run(M, variant=variant):
                res = _get(variant, M, multi, (name, L, np.dtype(dtype).str))(A, b)
                float(jnp.sum(res.x))
            st = iter_slope(run, iters=(20, 420), sets=1, reps=3)
            out.setdefault(variant, []).append(st.median_s)
    row = " | ".join(
        f"{k} {min(v) * 1e6:.2f} us/iter ({flops_iter / min(v) / 1e9:.1f} GF)"
        for k, v in out.items())
    print(f"{name} n={n} L={L} {np.dtype(dtype).name}: {row}")


if __name__ == "__main__":
    # A. fp64: does packing flip the multi-RHS losses?
    case("lap2d-64", generators.make_laplacian_grid2d(64).to_csr(), 4)
    case("lap2d-128", generators.make_laplacian_grid2d(128).to_csr(), 4)
    case("lap3d-32", generators.make_laplacian_grid3d(32).to_csr(), 4)
    case("lap3d-32", generators.make_laplacian_grid3d(32).to_csr(), 16)
    # ...and does it keep/extend the single-RHS wins?
    case("lap2d-64", generators.make_laplacian_grid2d(64).to_csr(), 1)
    case("lap3d-32", generators.make_laplacian_grid3d(32).to_csr(), 1)
    # B. post-guard fp32 single-RHS device rate (session-6 row redo)
    case("lap3d-32", generators.make_laplacian_grid3d(32).to_csr(), 1,
         dtype=np.float32, variants=("strict",))
    case("lap2d-64", generators.make_laplacian_grid2d(64).to_csr(), 4,
         dtype=np.float32, variants=("strict",))
    print("AB3 DONE")
