#!/usr/bin/env python
"""CG iteration-cost decomposition on the varcoef fixture (round 5).

The bf16 A/B (r5_bf16_ab.py) found the raw matvec is only ~1/3 of the
plain-CG iteration cost at W=128 (0.30 of 0.88 ms/iter) — the rest
caps any matvec win at 1.2x. Same-process slopes:

  (1) raw matvec (spmv chain)           — the kernel itself
  (2) plain CG device rate (tol=0)      — the production loop
  (3) BLAS-only CG body (matvec = 2*p)  — the loop minus the kernel
  (4) replacement-CG device rate        — cg_solve_bf16 loop
  (5) vector roofline                   — 12 streamed vectors/iter

Usage: r5_cg_decomp.py [W=128]
"""

import functools
import os
import signal
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

W = int(sys.argv[1]) if len(sys.argv) > 1 else 128


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def slope(tag, run, iters):
    K1, K2 = iters
    run(K1)
    run(K2)

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(3))
    t2 = min(t(K2) for _ in range(3))
    per = max((t2 - t1) / (K2 - K1), 1e-9)
    print(f"  {tag}: {per*1e6:.1f} us/iter", flush=True)
    return per


if __name__ == "__main__":
    import faulthandler

    faulthandler.register(signal.SIGUSR1)
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE: exiting for retry", flush=True)
            os._exit(3)

    _t = threading.Timer(600.0, _fire)
    _t.daemon = True
    _t.start()

    from tpusparse.io.generators import make_variable_stencil
    from tpusparse.ops.blas import dot_single
    from tpusparse.ops.spmv import plan_dia_bf16, plan_matrix, spmv
    from tpusparse.solvers.cg import cg_solve
    from tpusparse.solvers.refine import cg_solve_bf16

    stamp(f"build varcoef W={W}")
    csr = make_variable_stencil(W, dims=3, full=True, seed=2,
                                sigma=1.0, shift=1.0,
                                dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    A32 = plan_matrix(csr, strategy="dia", dtype=np.float32)
    A16 = plan_dia_bf16(csr)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    _staged.set()

    # (1) raw matvec
    @functools.partial(jax.jit, static_argnums=2)
    def mv_chain(A, x, M):
        def body(_, xc):
            y = spmv(A, xc)
            return y / (jnp.max(jnp.abs(y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, x)

    t_mv = slope("matvec f32    ",
                 lambda M: float(jnp.sum(mv_chain(A32, b, M))),
                 (20, 220))
    t_mv16 = slope("matvec bf16   ",
                   lambda M: float(jnp.sum(mv_chain(A16, b, M))),
                   (20, 220))

    # (2) plain CG device rate (pinned trips). NOTE: no outer jit —
    # an outer jit closure would embed the 226 MB plan as an
    # executable constant and wedge the tunnel (the 413-cap pattern);
    # cg_solve's own argument-dispatch jit is the production mode at
    # this plan size.
    cache = {}

    def cg_run(M):
        return float(jnp.sum(cg_solve(
            A32, b, max_iters=M, tolerance=0.0).x))

    t_cg = slope("plain CG      ", cg_run, (20, 220))

    # (3) BLAS-only body: same recurrence, matvec = 2*p elementwise
    def cg_blas(M):
        fn = cache.get(("blas", M))
        if fn is None:
            def solve(b_):
                def body(state):
                    i, x, r, p, rs = state
                    Ap = 2.0 * p
                    pAp = dot_single(p, Ap)
                    alpha = jnp.where(pAp == 0, 0.0, rs / pAp)
                    x = x + alpha * p
                    r = r - alpha * Ap
                    rs_new = dot_single(r, r)
                    beta = jnp.where(rs == 0, 0.0, rs_new / rs)
                    p = r + beta * p
                    return (i + 1, x, r, p, rs_new)

                def cond(state):
                    return (state[0] < M) & (state[4] >= 0.0)

                st = (jnp.int32(0), jnp.zeros_like(b_), b_, b_,
                      dot_single(b_, b_))
                return jax.lax.while_loop(cond, body, st)[1]

            fn = jax.jit(solve)
            cache[("blas", M)] = fn
        return float(jnp.sum(fn(b)))

    t_blas = slope("BLAS-only body", cg_blas, (20, 220))

    # (4) replacement CG device rate (argument dispatch, like (2)),
    # swept over replace_every to separate the sweep-boundary cost
    # (exact residual + loop re-entry) from the per-step cost;
    # re=10^9 runs the inner loop once to budget = the pure
    # nested-structure + bf16-step cost
    t_re = {}
    for re in (8, 32, 10**9):
        def repl_run(M, re=re):
            return float(jnp.sum(cg_solve_bf16(
                A16, A32, b, max_iters=M, tolerance=0.0,
                max_restarts=0, replace_every=re).x))

        t_re[re] = slope(f"repl re={re:<10d}", repl_run, (20, 220))
    t_repl = t_re[8]

    # control: the SAME nested structure with f32 planes both sides —
    # isolates "nested-loop/structure cost" from "bf16-in-loop cost"
    def nest32_run(M):
        return float(jnp.sum(cg_solve_bf16(
            A32, A32, b, max_iters=M, tolerance=0.0,
            max_restarts=0, replace_every=10**9).x))

    t_nest32 = slope("nest f32 ctrl ", nest32_run, (20, 220))

    v = 4.0 * n
    roof = 12 * v / 621e9
    stamp(f"roofline: 12 vec streams = {roof*1e6:.0f} us/iter at "
          f"621 GB/s; vector = {v/1e6:.1f} MB")
    stamp(f"accounting: plain {t_cg*1e6:.0f} = mv {t_mv*1e6:.0f} + "
          f"blas {t_blas*1e6:.0f} + residual "
          f"{(t_cg-t_mv-t_blas)*1e6:.0f} us")
    stamp(f"repl {t_repl*1e6:.0f} vs predicted "
          f"{(t_mv16 + t_blas + t_mv/8)*1e6:.0f} "
          f"(mv16 {t_mv16*1e6:.0f} + blas {t_blas*1e6:.0f} + mv32/8)")
