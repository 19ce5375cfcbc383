#!/usr/bin/env python
"""Single-RHS stream SpMV A/B: the dedicated (nb,)-grid kernel
(spmv_dia_stream, 3-block halo + (nb+2) pad) vs the edge-halo kernel
at L=1 (spmm_dia_stream_tp). Decides whether spmv_dia_stream should
route through the edge kernel."""

import functools
import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.formats.dia import partition_dia, select_diagonals
from tpusparse.io import generators
from tpusparse.kernels.dia_stream import (
    padded_cols,
    spmm_dia_stream_tp,
    spmv_dia_stream,
    to_device_dia_stream,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 192


def rate(tag, fn, A, X, nnz, iters=(4, 40)):
    @functools.partial(jax.jit, static_argnums=2)
    def chain(Aa, X0, M):
        def body(_, Xc):
            Y = fn(Aa, Xc)
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, X0)

    K1, K2 = iters

    def run(M):
        float(jnp.sum(chain(A, X, M)))

    run(K1), run(K2)

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(3))
    t2 = min(t(K2) for _ in range(3))
    per = max((t2 - t1) / (K2 - K1), 1e-9)
    gf = 2.0 * nnz / per / 1e9
    print(f"  spmv {tag}: {per*1e6:.1f} us, {gf:.1f} GF", flush=True)


if __name__ == "__main__":
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE, exiting for retry", flush=True)
            os._exit(3)

    t = threading.Timer(300.0, _fire)
    t.daemon = True
    t.start()

    jax.config.update("jax_enable_x64", True)
    csr = generators.make_laplacian_grid3d(K, dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    offs = select_diagonals(csr)
    dia_host, _ = partition_dia(csr, offs)
    print(f"lap3d-{K}: n={n} nnz={nnz}", flush=True)
    A = to_device_dia_stream(dia_host)
    float(jnp.sum(A.data_b[0, 0, 0]))
    del dia_host
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
    float(jnp.sum(x[:8]))
    _staged.set()
    print("staged", flush=True)

    np_ = padded_cols(A)
    xp = jnp.pad(x[None, :], ((0, 0), (0, np_ - n)))
    for _ in range(2):
        rate("edge(tp L=1)",
             lambda Aa, P: spmm_dia_stream_tp(Aa, P), A, xp, nnz)
        rate("dedicated(3blk)",
             lambda Aa, v: spmv_dia_stream(Aa, v), A, x, nnz)
    print("SPMV EDGE AB DONE", flush=True)
