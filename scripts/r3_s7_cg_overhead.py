#!/usr/bin/env python
"""Round-3 session-7: decompose the fp32 single-RHS CG iteration cost.

lap3d-32 fp32 CG measures 15.2 us/iter while the DIA SpMV alone is
~7 us and the vector traffic roofline is ~2-3 us. This pins where the
rest goes by timing pinned-trip while_loops with incrementally larger
bodies (same methodology as the solver device rates: iteration slope,
one process, interleaved passes).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix, spmv  # noqa: E402
from tpusparse.ops.blas import dot_single  # noqa: E402
from tpusparse.solvers.cg import _cg_solve_impl  # noqa: E402

_compiled = {}


def _loop(key, M, make_body, x0):
    if (key, M) not in _compiled:
        body = make_body()

        def run(x):
            def step(i, s):
                return body(s)
            return jax.lax.fori_loop(0, M, step, x)

        _compiled[(key, M)] = jax.jit(run)
    return _compiled[(key, M)]


def time_variant(name, make_body, x0, passes=3):
    outs = []
    for _ in range(passes):
        def run(M):
            r = _loop(name, M, make_body, x0)(x0)
            float(jnp.sum(r if isinstance(r, jnp.ndarray) else r[0]))
        st = iter_slope(run, iters=(20, 420), sets=1, reps=3)
        outs.append(st.median_s)
    print(f"{name}: {min(outs)*1e6:.2f} us/iter")
    return min(outs)


if __name__ == "__main__":
    csr = generators.make_laplacian_grid3d(32, dtype=np.float32).to_csr()
    A = plan_matrix(csr, dtype=np.float32)
    rng = np.random.default_rng(0)
    n = csr.num_rows
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # 1. loop floor: one elementwise op per iteration
    time_variant("floor (x*c)", lambda: (lambda x: x * 1.0000001), b)

    # 2. + DIA SpMV
    time_variant("spmv only", lambda: (lambda x: spmv(A, x) * 1e-3 + x), b)

    # 3. + the two scalar dots (carried through to keep them live)
    def make_body_dots():
        def body(s):
            x, acc = s
            y = spmv(A, x)
            d1 = dot_single(x, y)
            x2 = y * 1e-3 + x
            d2 = dot_single(x2, x2)
            return (x2, acc + d1 + d2)
        return body

    time_variant("spmv+2dots", make_body_dots, (b, jnp.float32(0.0)))

    # 4. full CG body (pinned trip count)
    def run_cg(M):
        f = _compiled.get(("cg", M))
        if f is None:
            f = jax.jit(lambda A_, b_: _cg_solve_impl(
                A_, b_, M, 0.0, "auto", None, None, False))
            _compiled[("cg", M)] = f
        r = f(A, b)
        float(jnp.sum(r.x))

    outs = []
    for _ in range(3):
        st = iter_slope(run_cg, iters=(20, 420), sets=1, reps=3)
        outs.append(st.median_s)
    print(f"full CG: {min(outs)*1e6:.2f} us/iter")
    print("OVERHEAD DONE")
