#!/usr/bin/env python
"""A/B at scale: n-major masked stream kernel vs the lane-major
masked stream kernel (the production multi-RHS path) on lap3d
stencils. Same-process, identical chain shape (matvec + full-array
normalize), interleaved passes. Usage: r3_s11_nmajor_ab.py [W] [L...]
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
        pack_gp, spmm_dia_nmajor_gp, to_device_dia_nmajor)
    from tpusparse.kernels.dia_stream import (
        padded_cols, spmm_dia_stream_tp, to_device_dia_stream)

    Wd = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    Ls = [int(a) for a in sys.argv[2:]] or [16, 32]
    csr = generators.make_laplacian_grid3d(Wd, dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    dia_host, _ = partition_dia(csr, select_diagonals(csr))
    print(f"lap3d-{Wd}: n={n} nnz={nnz}", flush=True)
    key = jax.random.PRNGKey(0)

    for L in Ls:
        rows = {}

        # lane-major masked (production)
        A = to_device_dia_stream(dia_host, L=L, masked=True)
        XTP = jax.random.normal(key, (L, padded_cols(A)), jnp.float32)

        @functools.partial(jax.jit, static_argnums=1)
        def chain_lm(X0, M, A=A):
            def body(_, Xc):
                Y = spmm_dia_stream_tp(A, Xc)
                return Y / (jnp.max(jnp.abs(Y)) + 1.0)
            return jax.lax.fori_loop(0, M, body, X0)

        rows["lane-major"] = (chain_lm, XTP)

        # n-major masked
        D = to_device_dia_nmajor(dia_host, L=L)
        Xg = pack_gp(D, jax.random.normal(key, (n, L), jnp.float32))
        Xg = jax.block_until_ready(Xg)

        @functools.partial(jax.jit, static_argnums=1)
        def chain_nm(X0, M, D=D):
            def body(_, Xc):
                Y = spmm_dia_nmajor_gp(D, Xc)
                return Y / (jnp.max(jnp.abs(Y)) + 1.0)
            return jax.lax.fori_loop(0, M, body, X0)

        rows["n-major  "] = (chain_nm, Xg)

        for _pass in range(2):
            for tag, (chain, X0) in rows.items():
                def run(M, chain=chain, X0=X0):
                    float(jnp.sum(chain(X0, M)))
                try:
                    per = time_chain(run)
                    gf = 2.0 * nnz * L / per / 1e9
                    print(f"L={L} {tag}: {per*1e3:.2f} ms/matvec, "
                          f"{gf:.1f} GF", flush=True)
                except Exception as e:
                    print(f"L={L} {tag}: ERROR {type(e).__name__}: "
                          f"{str(e)[:300]}", flush=True)
        del rows, A, D, XTP, Xg


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
