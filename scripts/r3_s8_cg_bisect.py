#!/usr/bin/env python
"""Bisect the production-CG 14.9 vs raw-body 3.4 us/iter gap (lap3d-32
fp32, real chip). Variants, cumulative toward _cg_solve_impl:
  raw        — while_loop CG body, A closed over (r3_s8_whileloop_ab)
  hist       — + carry the 0-size hist array (record_history=False path)
  arg        — + A and b passed as jit ARGUMENTS instead of closure
  impl       — jit(_cg_solve_impl) exactly as solvers/cg dispatches it
Interleaved same-process passes, iteration slope (20, 420).
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


def _cg(A, b, M, carry_hist):
    hist0 = jnp.zeros((0,), dtype=b.dtype)

    def body(state):
        if carry_hist:
            i, x, r, p, rs, hist = state
        else:
            i, x, r, p, rs = state
        Ap = spmv(A, p)
        pAp = dot_single(p, Ap)
        alpha = jnp.where(pAp == 0, 0.0, rs / pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = dot_single(r, r)
        beta = jnp.where(rs == 0, 0.0, rs_new / rs)
        p = r + beta * p
        out = (i + 1, x, r, p, rs_new)
        return out + (hist,) if carry_hist else out

    def cond(s):
        return (s[0] < M) & (jnp.sqrt(s[4]) >= 0.0)

    st0 = (jnp.int32(0), jnp.zeros_like(b), b, b, dot_single(b, b))
    if carry_hist:
        st0 = st0 + (hist0,)
    return jax.lax.while_loop(cond, body, st0)


def get(key, builder):
    if key not in _compiled:
        _compiled[key] = builder()
    return _compiled[key]


def time_variant(name, runner, passes=2):
    outs = []
    for _ in range(passes):
        st = iter_slope(runner, iters=(20, 420), sets=1, reps=3)
        outs.append(st.median_s)
    print(f"{name}: {min(outs)*1e6:.2f} us/iter")


if __name__ == "__main__":
    csr = generators.make_laplacian_grid3d(32, dtype=np.float32).to_csr()
    A = plan_matrix(csr, dtype=np.float32)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(csr.num_rows).astype(np.float32))

    def run_raw(M):
        f = get(("raw", M), lambda: jax.jit(lambda: _cg(A, b, M, False)))
        float(jnp.sum(f()[1]))

    def run_hist(M):
        f = get(("hist", M), lambda: jax.jit(lambda: _cg(A, b, M, True)))
        float(jnp.sum(f()[1]))

    def run_arg(M):
        f = get(("arg", M), lambda: jax.jit(
            lambda A_, b_: _cg(A_, b_, M, True)))
        float(jnp.sum(f(A, b)[1]))

    def run_impl(M):
        f = get(("impl", M), lambda: jax.jit(lambda A_, b_: _cg_solve_impl(
            A_, b_, M, 0.0, "auto", None, None, False)))
        float(jnp.sum(f(A, b).x))

    for _ in range(2):
        time_variant("raw ", run_raw)
        time_variant("hist", run_hist)
        time_variant("arg ", run_arg)
        time_variant("impl", run_impl)
    print("BISECT DONE")
