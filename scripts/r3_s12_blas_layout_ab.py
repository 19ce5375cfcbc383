#!/usr/bin/env python
"""Isolate the CG-body BLAS-1 cost by layout: run the multi-RHS CG
recurrences with the matvec replaced by a trivial elementwise op
(AP = P * 1.0001) in (a) the transposed (L, n) layout and (b) the
n-major guarded flat (T_g, 128) layout. Same traffic per iteration;
any delta is pure layout/reduction efficiency.
Usage: r3_s12_blas_layout_ab.py [W] [L...]
"""

import functools
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_chain(run, K1=4, K2=24, reps=3):
    run(K1), run(K2)

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(reps))
    t2 = min(t(K2) for _ in range(reps))
    return max((t2 - t1) / (K2 - K1), 1e-9)


def body_iters_t(B0, M):
    """Transposed-layout CG body, matvec = scale."""
    L = B0.shape[0]
    b_norms = jnp.ones((L,), jnp.float32)

    def body(i, state):
        X, R, P, rs_old, converged = state
        AP = P * jnp.float32(1.0001)
        pAp = jnp.sum(P * AP, axis=1)
        alpha = jnp.where(converged | (pAp == 0), 0.0, rs_old / pAp)
        X = X + alpha[:, None] * P
        R = R - alpha[:, None] * AP
        rs_new = jnp.sum(R * R, axis=1)
        rel = jnp.sqrt(rs_new) / b_norms
        converged = converged | (rel < 0.0)
        beta = jnp.where(converged | (rs_old == 0), 0.0, rs_new / rs_old)
        P = R + beta[:, None] * P
        return (X, R, P, rs_new, converged)

    X = jnp.zeros_like(B0)
    st = (X, B0, B0, jnp.sum(B0 * B0, axis=1),
          jnp.zeros((L,), bool))
    return jax.lax.fori_loop(0, M, body, st)[0]


def body_iters_gp(B0, M, Lp):
    """Guarded-flat interleaved CG body, matvec = scale."""
    from tpusparse.kernels.dia_nmajor import fold_lanes, tile_lanes

    def dot_gp(U, V):
        return fold_lanes(jnp.sum(U * V, axis=0), Lp)

    b_norms = jnp.ones((Lp,), jnp.float32)

    def body(i, state):
        X, R, P, rs_old, converged = state
        AP = P * jnp.float32(1.0001)
        pAp = dot_gp(P, AP)
        alpha = jnp.where(converged | (pAp == 0), 0.0, rs_old / pAp)
        a = tile_lanes(alpha, Lp)
        X = X + a * P
        R = R - a * AP
        rs_new = dot_gp(R, R)
        rel = jnp.sqrt(rs_new) / b_norms
        converged = converged | (rel < 0.0)
        beta = jnp.where(converged | (rs_old == 0), 0.0, rs_new / rs_old)
        P = R + tile_lanes(beta, Lp) * P
        return (X, R, P, rs_new, converged)

    X = jnp.zeros_like(B0)
    st = (X, B0, B0, dot_gp(B0, B0), jnp.zeros((Lp,), bool))
    return jax.lax.fori_loop(0, M, body, st)[0]


def main():
    from tpusparse.utils.transfer import device_put_chunked

    Wd = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    Ls = [int(a) for a in sys.argv[2:]] or [8, 32]
    n = Wd ** 3
    rng = np.random.default_rng(0)
    for L in Ls:
        T = -(-n * L // 128)
        Bt = device_put_chunked(
            rng.standard_normal((L, n)).astype(np.float32))
        Bg = device_put_chunked(
            rng.standard_normal((T, 128)).astype(np.float32))
        jax.block_until_ready((Bt, Bg))
        ft = jax.jit(functools.partial(body_iters_t),
                     static_argnums=1)
        fg = jax.jit(functools.partial(body_iters_gp, Lp=L),
                     static_argnums=1)
        for _pass in range(2):
            for tag, f, X0 in (("transposed ", ft, Bt),
                               ("interleaved", fg, Bg)):
                def run(M, f=f, X0=X0):
                    float(jnp.sum(f(X0, M)))
                per = time_chain(run)
                print(f"L={L} {tag}: {per*1e3:.3f} ms/iter", flush=True)
        del Bt, Bg


if __name__ == "__main__":
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE, exiting for retry", flush=True)
            os._exit(3)

    th = threading.Timer(600.0, _fire)
    th.daemon = True
    th.start()
    _staged.set()
    main()
