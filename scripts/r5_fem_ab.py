#!/usr/bin/env python
"""FEM/gather-plan solver tier A/B (round 5, VERDICT r4 item 3).

The fem2d class was the round-4 slow tier (510 us/iter CG, 1408 PCG,
measured in NATURAL order). Host diagnostics (round 5): the random-
Delaunay node order is the problem — RCM recovers bandwidth 29850 ->
850, lifting ELL occupancy 0.029 -> 0.184 (6.4x fewer jobs) and
cutting the merge plan's gather spans 29.6 -> 9.2 mean (the kernel's
static trip count). reorder='auto' already selects rcm+merge on this
class; this script measures what that is worth on chip, same process,
interleaved:

  (1) SpMV slope, natural merge vs rcm+merge (permute inside)
  (2) single-RHS CG device rate (pinned trips), natural vs reordered
  (3) multi-RHS CG L=8 device rate, natural vs reordered

Usage: r5_fem_ab.py [N=30000]
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30000


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
    print(f"  {tag}: {per*1e6:.1f} us/op", flush=True)
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

    from tpusparse.io.generators import make_fem2d
    from tpusparse.ops.spmv import plan_kind, plan_matrix, spmm, spmv
    from tpusparse.solvers.cg import cg_solve, cg_solve_multi

    stamp(f"build fem2d N={N}")
    csr = make_fem2d(N, dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    A_nat = plan_matrix(csr, strategy="auto", dtype=np.float32)
    A_ro = plan_matrix(csr, strategy="auto", dtype=np.float32,
                       reorder="auto")
    A8_nat = plan_matrix(csr, strategy="auto", dtype=np.float32, L=8)
    A8_ro = plan_matrix(csr, strategy="auto", dtype=np.float32, L=8,
                        reorder="auto")
    stamp(f"n={n} nnz={nnz} plans: {plan_kind(A_nat)} vs "
          f"{plan_kind(A_ro)}")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    # golden
    ref = csr.to_scipy() @ np.asarray(x0)
    for tag, A in (("nat", A_nat), ("ro", A_ro)):
        y = np.asarray(spmv(A, x0))
        rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1)
        assert rel < 2e-5, (tag, rel)
    _staged.set()

    # (1) SpMV slope, interleaved twice
    @functools.partial(jax.jit, static_argnums=2)
    def mv_chain(A, x, M):
        def body(_, xc):
            y = spmv(A, xc)
            return y / (jnp.max(jnp.abs(y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, x)

    res = {}
    for _ in range(2):
        res.setdefault("nat", []).append(slope(
            "spmv natural  ",
            lambda M: float(jnp.sum(mv_chain(A_nat, x0, M))),
            (20, 220)))
        res.setdefault("ro", []).append(slope(
            "spmv rcm+merge",
            lambda M: float(jnp.sum(mv_chain(A_ro, x0, M))),
            (20, 220)))
    w = min(res["nat"]) / min(res["ro"])
    gf = 2.0 * nnz / min(res["ro"]) / 1e9
    stamp(f"SpMV win {w:.2f}x (rcm+merge {gf:.1f} GF)")

    # (2) single-RHS CG device rate
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cache = {}

    def cg_rate(tag, A):
        def run(M):
            fn = cache.get((tag, M))
            if fn is None:
                fn = jax.jit(lambda b_: cg_solve(
                    A, b_, max_iters=M, tolerance=0.0).x)
                cache[(tag, M)] = fn
            return float(jnp.sum(fn(b)))

        return slope(f"CG {tag}", run, (20, 220))

    t_n = cg_rate("natural  ", A_nat)
    t_r = cg_rate("rcm+merge", A_ro)
    stamp(f"CG L=1 win {t_n/t_r:.2f}x ({t_r*1e6:.0f} us/iter, "
          f"{(2.0*nnz + 10.0*n)/t_r/1e9:.1f} GF)")

    # (3) multi-RHS CG L=8
    B = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

    def mcg_rate(tag, A):
        def run(M):
            fn = cache.get(("m" + tag, M))
            if fn is None:
                fn = jax.jit(lambda B_: cg_solve_multi(
                    A, B_, max_iters=M, tolerance=0.0).x)
                cache[("m" + tag, M)] = fn
            return float(jnp.sum(fn(B)))

        return slope(f"multiCG {tag}", run, (20, 220))

    tm_n = mcg_rate("natural  ", A8_nat)
    tm_r = mcg_rate("rcm+merge", A8_ro)
    stamp(f"CG L=8 win {tm_n/tm_r:.2f}x ({tm_r*1e6:.0f} us/iter, "
          f"{(2.0*nnz + 10.0*n)*8/tm_r/1e9:.1f} GF)")
    # convergence sanity at real tolerance (iterations equal under
    # permutation)
    rn = cg_solve(A_nat, b, tolerance=1e-5, max_iters=4000)
    rr = cg_solve(A_ro, b, tolerance=1e-5, max_iters=4000)
    stamp(f"iters natural={int(rn.iterations)} "
          f"reordered={int(rr.iterations)}")
