#!/usr/bin/env python
"""Round-3 session-8: is while_loop the missing 12 us/iter in CG?

r3_s7 decomposition (lap3d-32 fp32, real chip): loop floor 0.06,
SpMV 1.86, SpMV+2dots 2.87, full CG body 14.91 us/iter. The CG body
only adds 3 axpys (~1.5 us roofline) — this A/Bs the same FULL CG body
under (a) lax.while_loop with the tolerance cond (production path),
(b) lax.fori_loop with the cond folded into masks (no early exit),
and (c) while_loop whose cond only checks i < M (no rs dependence).
Same methodology: iteration slope, one process, interleaved passes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix, spmv  # noqa: E402
from tpusparse.ops.blas import dot_single  # noqa: E402

_compiled = {}


def _body_factory(A):
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
    return body


def _make(kind, A, b, M):
    body = _body_factory(A)
    st0 = (jnp.int32(0), jnp.zeros_like(b), b, b, dot_single(b, b))
    if kind == "while_tol":
        def run():
            def cond(s):
                return (s[0] < M) & (jnp.sqrt(s[4]) >= 0.0)
            return jax.lax.while_loop(cond, body, st0)
    elif kind == "while_i":
        def run():
            def cond(s):
                return s[0] < M
            return jax.lax.while_loop(cond, body, st0)
    else:  # fori
        def run():
            return jax.lax.fori_loop(0, M, lambda i, s: body(s), st0)
    return jax.jit(run)


def time_variant(name, kind, A, b, passes=3):
    outs = []
    for _ in range(passes):
        def run(M):
            key = (kind, M)
            if key not in _compiled:
                _compiled[key] = _make(kind, A, b, M)
            r = _compiled[key]()
            float(jnp.sum(r[1]))
        st = iter_slope(run, iters=(20, 420), sets=1, reps=3)
        outs.append(st.median_s)
    print(f"{name}: {min(outs)*1e6:.2f} us/iter")
    return min(outs)


if __name__ == "__main__":
    csr = generators.make_laplacian_grid3d(32, dtype=np.float32).to_csr()
    A = plan_matrix(csr, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(csr.num_rows).astype(np.float32))
    for _ in range(2):  # interleaved passes
        time_variant("fori      ", "fori", A, b, passes=2)
        time_variant("while_i   ", "while_i", A, b, passes=2)
        time_variant("while_tol ", "while_tol", A, b, passes=2)
    print("AB DONE")
