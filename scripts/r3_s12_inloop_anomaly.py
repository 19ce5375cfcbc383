#!/usr/bin/env python
"""Locate the n-major kernel's in-loop penalty: the standalone chain
costs ~4.8 ms/matvec at lap3d-192 L=32 but the CG loop pays ~9.2 ms
for the same call (scripts/r3_s12_nmajor_cg_ab.py). Incremental
variants between the two shapes, same process:

  v0  fori chain, P <- normalize(kernel(P))            (the micro)
  v1  while_loop, same body                            (loop form)
  v2  while_loop, carry (P, X, R), elementwise consumers of AP/P
  v3  v2 + per-RHS dots (fold_lanes) feeding a scalar into the updates
  v4  full CG body (the solver)

Usage: r3_s12_inloop_anomaly.py [W] [L]
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


def main():
    from tpusparse.formats.dia import partition_dia, select_diagonals
    from tpusparse.io import generators
    from tpusparse.kernels.dia_nmajor import (
        fold_lanes,
        pack_gp,
        spmm_dia_nmajor_gp,
        tile_lanes,
        to_device_dia_nmajor,
    )

    Wd = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    csr = generators.make_laplacian_grid3d(Wd, dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    dia_host, _ = partition_dia(csr, select_diagonals(csr))
    D = to_device_dia_nmajor(dia_host, L)
    print(f"lap3d-{Wd} L={L}: n={n} nnz={nnz}", flush=True)
    rng = np.random.default_rng(0)
    Pg = jax.block_until_ready(pack_gp(
        D, jnp.asarray(rng.standard_normal((n, L)).astype(np.float32))))
    Lp = D.L

    def dot_gp(U, V):
        return fold_lanes(jnp.sum(U * V, axis=0), Lp)

    def norm(Y):
        return Y / (jnp.max(jnp.abs(Y)) + 1.0)

    @functools.partial(jax.jit, static_argnums=1)
    def v0(P0, M):
        return jax.lax.fori_loop(
            0, M, lambda _, P: norm(spmm_dia_nmajor_gp(D, P)), P0)

    @functools.partial(jax.jit, static_argnums=1)
    def v1(P0, M):
        def body(st):
            i, P = st
            return (i + 1, norm(spmm_dia_nmajor_gp(D, P)))
        return jax.lax.while_loop(lambda st: st[0] < M, body,
                                  (jnp.int32(0), P0))[1]

    @functools.partial(jax.jit, static_argnums=1)
    def v2(P0, M):
        def body(st):
            i, P, X, R = st
            AP = spmm_dia_nmajor_gp(D, P)
            X = X + jnp.float32(0.5) * P
            R = R - jnp.float32(0.5) * AP
            return (i + 1, norm(AP), X, R)
        st = (jnp.int32(0), P0, jnp.zeros_like(P0), P0)
        return jax.lax.while_loop(lambda st: st[0] < M, body, st)[1]

    @functools.partial(jax.jit, static_argnums=1)
    def v3(P0, M):
        def body(st):
            i, P, X, R = st
            AP = spmm_dia_nmajor_gp(D, P)
            pAp = dot_gp(P, AP)
            a = tile_lanes(jnp.float32(0.5) / (pAp + 1.0), Lp)
            X = X + a * P
            R = R - a * AP
            return (i + 1, norm(AP), X, R)
        st = (jnp.int32(0), P0, jnp.zeros_like(P0), P0)
        return jax.lax.while_loop(lambda st: st[0] < M, body, st)[1]

    variants = {"v0 fori ": v0, "v1 while": v1, "v2 +carry": v2,
                "v3 +dots": v3}
    for _pass in range(2):
        for tag, f in variants.items():
            def run(M, f=f):
                float(jnp.sum(f(Pg, M)))
            per = time_chain(run)
            print(f"{tag}: {per*1e3:.3f} ms/iter", flush=True)


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
