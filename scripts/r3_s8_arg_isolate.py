#!/usr/bin/env python
"""Isolate WHICH jit argument costs ~11 us/iter in the CG loop
(lap3d-32 fp32 Hybrid/DIA plan; r3_s8_cg_bisect showed closure 3.3 vs
arguments 15 us/iter). Variants: A-as-arg/b-closed, b-as-arg/A-closed,
both closed, both args; plus 'donate' (donate A's buffers) and
'dataarg' (only the DIA plane array as arg, plan rebuilt inside).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix, spmv  # noqa: E402
from tpusparse.ops.blas import dot_single  # noqa: E402

_compiled = {}


def _cg_body(A):
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


def _loop(A, b, M):
    body = _cg_body(A)

    def cond(s):
        return (s[0] < M) & (jnp.sqrt(s[4]) >= 0.0)

    st0 = (jnp.int32(0), jnp.zeros_like(b), b, b, dot_single(b, b))
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

    def run_closed(M):
        f = get(("closed", M), lambda: jax.jit(lambda: _loop(A, b, M)))
        float(jnp.sum(f()[1]))

    def run_argA(M):
        f = get(("argA", M), lambda: jax.jit(
            lambda A_: _loop(A_, b, M)))
        float(jnp.sum(f(A)[1]))

    def run_argb(M):
        f = get(("argb", M), lambda: jax.jit(
            lambda b_: _loop(A, b_, M)))
        float(jnp.sum(f(b)[1]))

    def run_argboth(M):
        f = get(("both", M), lambda: jax.jit(
            lambda A_, b_: _loop(A_, b_, M)))
        float(jnp.sum(f(A, b)[1]))

    for _ in range(2):
        time_variant("closed   ", run_closed)
        time_variant("arg A    ", run_argA)
        time_variant("arg b    ", run_argb)
        time_variant("arg both ", run_argboth)
    print("ISOLATE DONE")
