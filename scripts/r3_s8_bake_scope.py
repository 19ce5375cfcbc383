#!/usr/bin/env python
"""Scope the plan-as-constant CG win: does closing over the plan (vs
passing it as a jit argument) help (a) the DIA/Hybrid path at a larger
size (lap3d-48), (b) the Pallas merge-kernel path (rmat-14), (c) fp64
native-DIA planes? Also prints compile time of the baked executable.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix, spmv  # noqa: E402
from tpusparse.ops.blas import dot_single  # noqa: E402

_compiled = {}


def _loop(A, b, M):
    def body(state):
        i, x, r, p, rs = state
        Ap = spmv(A, p)
        pAp = dot_single(p, Ap)
        alpha = jnp.where(pAp == 0, 0.0, rs / pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = dot_single(r, r)
        beta = jnp.where(rs == 0, 0.0, rs_new / rs)
        p = r + beta * p
        return (i + 1, x, r, p, rs_new)

    def cond(s):
        return (s[0] < M) & (jnp.sqrt(s[4]) >= 0.0)

    st0 = (jnp.int32(0), jnp.zeros_like(b), b, b, dot_single(b, b))
    return jax.lax.while_loop(cond, body, st0)


def time_pair(tag, A, b):
    def run_closed(M):
        key = (tag, "c", M)
        if key not in _compiled:
            t0 = time.perf_counter()
            f = jax.jit(lambda: _loop(A, b, M))
            f_l = f.lower().compile()
            print(f"  [{tag} closed M={M} compile "
                  f"{time.perf_counter()-t0:.1f}s]")
            _compiled[key] = f_l
        float(jnp.sum(_compiled[key]()[1]))

    def run_arg(M):
        key = (tag, "a", M)
        if key not in _compiled:
            _compiled[key] = jax.jit(lambda A_, b_: _loop(A_, b_, M))
        float(jnp.sum(_compiled[key](A, b)[1]))

    for _ in range(2):
        for name, r in (("closed", run_closed), ("arg   ", run_arg)):
            st = iter_slope(r, iters=(20, 420), sets=1, reps=3)
            print(f"{tag} {name}: {st.median_s*1e6:.2f} us/iter")


if __name__ == "__main__":
    rng = np.random.default_rng(0)

    csr48 = generators.make_laplacian_grid3d(48, dtype=np.float32).to_csr()
    A48 = plan_matrix(csr48, dtype=np.float32)
    b48 = jnp.asarray(rng.standard_normal(csr48.num_rows).astype(np.float32))
    time_pair("lap3d48-f32-dia ", A48, b48)

    coo = generators.make_rmat(14, edge_factor=8, seed=1,
                               symmetric=True, dtype=np.float32)
    csr_r = coo.to_csr()
    Am = plan_matrix(csr_r, dtype=np.float32, strategy="merge")
    bm = jnp.asarray(rng.standard_normal(csr_r.num_rows).astype(np.float32))
    time_pair("rmat14-f32-merge", Am, bm)

    print("SCOPE DONE")
