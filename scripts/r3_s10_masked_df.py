#!/usr/bin/env python
"""Masked-DIA df (fp64) A/B (session 10).

fp64 value planes cost 8K B/row as hi/lo f32 pairs in the df stream
kernel (and the XLA native-f64 path is elementwise-FMA compute-bound);
a constant-coefficient operator compresses them to one int32 word per
row + static hi/lo scalar pairs. Measures, same process, interleaved:

  stage A (lap3d-48, the fp64 CLI default regime): xla-f64(baked) vs
    df-masked(baked) vs df-unmasked(baked), L=1.
  stage B (lap3d-K, default 170, 275 MB f64 planes): masked vs
    unmasked df stream at L=1 and L=32 on padded solver state.

Usage: r3_s10_masked_df.py [K=170] [L=32] [stage=AB]
"""

import functools
import os
import signal
import sys
import threading
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from tpusparse.formats.dia import partition_dia, select_diagonals, to_device_dia
from tpusparse.io import generators
from tpusparse.kernels.dia_stream import (
    padded_cols_df,
    spmm_dia_stream_df_tp,
    spmv_dia_stream_df,
    to_device_dia_stream_df,
)
from tpusparse.ops.dia import spmv_dia

K = int(sys.argv[1]) if len(sys.argv) > 1 else 170
L = int(sys.argv[2]) if len(sys.argv) > 2 else 32
STAGES = sys.argv[3] if len(sys.argv) > 3 else "AB"


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rate(tag, fn_of_x, X0, nnz, L_eff, iters):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(X, M):
        def body(_, Xc):
            Y = fn_of_x(Xc)
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, X)

    K1, K2 = iters

    def run(M):
        float(jnp.sum(chain(X0, M)))

    run(K1)
    run(K2)

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(3))
    t2 = min(t(K2) for _ in range(3))
    per = max((t2 - t1) / (K2 - K1), 1e-9)
    gf = 2.0 * nnz * L_eff / per / 1e9
    print(f"  {tag}: {per*1e6:.1f} us/op, {gf:.1f} GF", flush=True)
    return per


if __name__ == "__main__":
    import faulthandler

    faulthandler.register(signal.SIGUSR1)
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE: exiting for retry", flush=True)
            os._exit(3)

    _t = threading.Timer(420.0, _fire)
    _t.daemon = True
    _t.start()

    if "A" in STAGES:
        stamp("stage A: lap3d-48 fp64 default regime (baked, L=1)")
        csr = generators.make_laplacian_grid3d(48,
                                               dtype=np.float64).to_csr()
        n, nnz = csr.num_rows, csr.nnz
        offs = select_diagonals(csr)
        dia_host, rest = partition_dia(csr, offs)
        assert rest.nnz == 0
        A_x = to_device_dia(dia_host, dtype=np.float64)
        A_m = to_device_dia_stream_df(dia_host)
        A_u = to_device_dia_stream_df(dia_host, masked=False)
        assert A_m.data_hi is None and A_u.mask_b is None
        x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float64)
        _staged.set()
        y_m = np.asarray(spmv_dia_stream_df(A_m, x))
        y_x = np.asarray(spmv_dia(A_x, x))
        err = np.abs(y_m - y_x).max() / np.abs(y_x).max()
        print(f"  parity df-masked vs xla-f64 rel={err:.2e}",
              flush=True)
        for _ in range(2):
            rate("xla-f64(baked)", lambda v: spmv_dia(A_x, v), x, nnz,
                 1, (50, 500))
            rate("df-masked(baked)",
                 lambda v: spmv_dia_stream_df(A_m, v), x, nnz, 1,
                 (50, 500))
            rate("df-unmasked(baked)",
                 lambda v: spmv_dia_stream_df(A_u, v), x, nnz, 1,
                 (50, 500))

    if "B" in STAGES:
        stamp(f"stage B: lap3d-{K} df stream regime")
        csr = generators.make_laplacian_grid3d(K,
                                               dtype=np.float64).to_csr()
        n, nnz = csr.num_rows, csr.nnz
        offs = select_diagonals(csr)
        dia_host, rest = partition_dia(csr, offs)
        assert rest.nnz == 0
        print(f"  f64 planes {dia_host.data.size*8/1e6:.0f} MB -> "
              f"mask {n*4/1e6:.0f} MB", flush=True)
        stamp("building device plans...")
        A_m1 = to_device_dia_stream_df(dia_host, L=1)
        A_u1 = to_device_dia_stream_df(dia_host, L=1, masked=False)
        A_mL = to_device_dia_stream_df(dia_host, L=L)
        A_uL = to_device_dia_stream_df(dia_host, L=L, masked=False)
        float(jnp.sum(A_uL.data_hi[0, 0, 0]))
        stamp("plans on device")
        key = jax.random.PRNGKey(0)
        _staged.set()

        np1 = padded_cols_df(A_m1)
        x1 = jax.random.normal(key, (1, np1), jnp.float64)
        np1u = padded_cols_df(A_u1)
        x1u = x1[:, :np1u] if np1u <= np1 else jnp.pad(
            x1, ((0, 0), (0, np1u - np1)))
        for _ in range(2):
            rate("L=1 df-masked(arg-x)",
                 lambda P: spmm_dia_stream_df_tp(A_m1, P), x1, nnz, 1,
                 (10, 100))
            rate("L=1 df-unmasked(arg-x)",
                 lambda P: spmm_dia_stream_df_tp(A_u1, P), x1u, nnz,
                 1, (10, 100))

        npm = padded_cols_df(A_mL)
        XT = jax.random.normal(key, (L, npm), jnp.float64)
        npu = padded_cols_df(A_uL)
        XTu = XT[:, :npu] if npu <= npm else jnp.pad(
            XT, ((0, 0), (0, npu - npm)))
        for _ in range(2):
            rate(f"L={L} df-masked",
                 lambda P: spmm_dia_stream_df_tp(A_mL, P), XT, nnz, L,
                 (3, 15))
            rate(f"L={L} df-unmasked",
                 lambda P: spmm_dia_stream_df_tp(A_uL, P), XTu, nnz,
                 L, (3, 15))

    print("MASKED DF AB DONE", flush=True)
