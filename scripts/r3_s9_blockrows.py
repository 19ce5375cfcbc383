#!/usr/bin/env python
"""Edge-kernel block_rows sweep at L=32 (lap3d-192): the MXU-rotation
wash showed the residual per-step cost is DMA orchestration, so fewer
bigger blocks should win until VMEM pressure bites. Also sweeps L=1
(the single-RHS path shares the kernel)."""

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
    to_device_dia_stream,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 192
L = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def rate(tag, A, XTP, nnz, iters=(4, 40)):
    @functools.partial(jax.jit, static_argnums=2)
    def chain(Aa, X0, M):
        def body(_, Xc):
            Y = spmm_dia_stream_tp(Aa, Xc)
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, X0)

    K1, K2 = iters

    def run(M):
        float(jnp.sum(chain(A, XTP, M)))

    try:
        run(K1), run(K2)
    except Exception as e:
        print(f"  {tag}: ERROR {type(e).__name__}: {e}", flush=True)
        return

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(3))
    t2 = min(t(K2) for _ in range(3))
    per = max((t2 - t1) / (K2 - K1), 1e-9)
    gf = 2.0 * nnz * L / per / 1e9
    print(f"  {tag}: {per*1e6:.1f} us/matvec, {gf:.1f} GF", flush=True)


if __name__ == "__main__":
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE, exiting for retry", flush=True)
            os._exit(3)

    t = threading.Timer(420.0, _fire)
    t.daemon = True
    t.start()

    jax.config.update("jax_enable_x64", True)
    csr = generators.make_laplacian_grid3d(K, dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    offs = select_diagonals(csr)
    dia_host, _ = partition_dia(csr, offs)
    print(f"lap3d-{K}: n={n} nnz={nnz} L={L}", flush=True)
    key = jax.random.PRNGKey(0)
    XT = jax.random.normal(key, (L, n), jnp.float32)
    float(jnp.sum(XT[:, :8]))
    _staged.set()
    print("staged", flush=True)

    for blk in (131072, 262144, 524288, 1048576):
        A = to_device_dia_stream(dia_host, block_rows=blk)
        float(jnp.sum(A.data_b[0, 0, 0]))
        np_ = padded_cols(A)
        XTP = jnp.pad(XT, ((0, 0), (0, np_ - n)))
        for _ in range(2):
            rate(f"blk={blk//1024}k (nb={A.data_b.shape[0]})", A,
                 XTP, nnz)
        del A, XTP
    print("BLOCKROWS SWEEP DONE", flush=True)
