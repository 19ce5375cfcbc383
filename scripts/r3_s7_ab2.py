#!/usr/bin/env python
"""Round-3 session-7 follow-up: calibrate the df-dot size gate.

Session-7 A/B (r3_s7_ab.py): df-dot CG is 1.4x at n=32768 L=1 but
0.85x at n=4096 L=4 — the pairwise df tree has ~log2(n) sequential
stages whose fixed overhead dominates once the emulated f64 reduction
is itself small. This sweep measures the solver device rate at both
flags across n to place DF_DOT_MIN_N.
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


def _get(flag, M, multi, key2):
    key = (flag, M, multi, key2)
    if key not in _compiled:
        blas.F64_COMPENSATED_DOT = flag
        if multi:
            f = jax.jit(lambda A_, B_: _cg_solve_multi_impl(
                A_, B_, M, 0.0, "auto", None, False))
        else:
            f = jax.jit(lambda A_, b_: _cg_solve_impl(
                A_, b_, M, 0.0, "auto", None, None, False))
        _compiled[key] = f
    return _compiled[key]


def case(name, csr, L):
    A = plan_matrix(csr, dtype=np.float64)
    n, nnz = csr.num_rows, csr.nnz
    rng = np.random.default_rng(0)
    shape = (n,) if L == 1 else (n, L)
    b = jnp.asarray(rng.standard_normal(shape))
    multi = L > 1
    out = {}
    for p in range(2):
        for flag in (False, True):
            def run(M, flag=flag):
                res = _get(flag, M, multi, (name, L))(A, b)
                float(jnp.sum(res.x))
            st = iter_slope(run, iters=(20, 420), sets=1, reps=3)
            out.setdefault(flag, []).append(st.median_s)
    s0 = min(out[False]) * 1e6
    s1 = min(out[True]) * 1e6
    print(f"{name} n={n} L={L}: strict {s0:.2f} us/iter, "
          f"df {s1:.2f} us/iter, ratio {s0 / s1:.2f}x")


if __name__ == "__main__":
    case("lap2d-64", generators.make_laplacian_grid2d(64).to_csr(), 1)
    case("lap2d-96", generators.make_laplacian_grid2d(96).to_csr(), 1)
    case("lap2d-128", generators.make_laplacian_grid2d(128).to_csr(), 1)
    case("lap3d-24", generators.make_laplacian_grid3d(24).to_csr(), 1)
    case("lap3d-32", generators.make_laplacian_grid3d(32).to_csr(), 1)
    case("lap2d-64/L4", generators.make_laplacian_grid2d(64).to_csr(), 4)
    case("lap2d-128/L4", generators.make_laplacian_grid2d(128).to_csr(), 4)
    case("lap3d-32/L4", generators.make_laplacian_grid3d(32).to_csr(), 4)
    print("AB2 DONE")
