#!/usr/bin/env python
"""Masked-DIA compression A/B (session 10).

Constant-coefficient stencils compress K f32 value planes to ONE
int32 bitmask word per row + K static scalars (bit-identical results;
formats.dia.plane_constants). The stream kernel is DMA-bound, so the
predicted win is the plane-traffic ratio at L=1 and a smaller share
at L=32 (x/y dominate). Measures, same process, interleaved:

  stage A (lap3d-48, the bench.py headline regime): baked-const
    chains of xla-dia vs masked-stream vs unmasked-stream at L=1.
  stage B (lap3d-K, default 192, 198 MB planes): masked vs unmasked
    stream at L=1 and L=32, plan as jit argument; masked also baked
    (28 MB mask < BAKE_MAX_BYTES where the 198 MB planes are not).

Usage: r3_s10_masked_dia.py [K=192] [L=32] [stage=AB]
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

from tpusparse.formats.dia import partition_dia, select_diagonals, to_device_dia
from tpusparse.io import generators
from tpusparse.kernels.dia_stream import to_device_dia_stream
from tpusparse.ops.dia import spmv_dia

K = int(sys.argv[1]) if len(sys.argv) > 1 else 192
L = int(sys.argv[2]) if len(sys.argv) > 2 else 32
STAGES = sys.argv[3] if len(sys.argv) > 3 else "AB"


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rate_arg(tag, fn, A, X0, nnz, L_eff, iters):
    """Chained slope, plan as jit ARGUMENT."""

    @functools.partial(jax.jit, static_argnums=2)
    def chain(Aa, X, M):
        def body(_, Xc):
            Y = fn(Aa, Xc)
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, X)

    K1, K2 = iters

    def run(M):
        float(jnp.sum(chain(A, X0, M)))

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


def rate_baked(tag, fn_of_x, X0, nnz, L_eff, iters):
    """Chained slope with the PLAN BAKED as a closure constant (the
    production solver dispatch below BAKE_MAX_BYTES)."""

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

    from tpusparse.kernels.dia_stream import (
        padded_cols,
        spmm_dia_stream_tp,
        spmv_dia_stream,
    )

    if "A" in STAGES:
        stamp("stage A: lap3d-48 headline regime (baked chains, L=1)")
        csr = generators.make_laplacian_grid3d(48,
                                               dtype=np.float32).to_csr()
        n, nnz = csr.num_rows, csr.nnz
        offs = select_diagonals(csr)
        dia_host, rest = partition_dia(csr, offs)
        assert rest.nnz == 0
        A_x = to_device_dia(dia_host, dtype=np.float32)
        A_m = to_device_dia_stream(dia_host)
        A_u = to_device_dia_stream(dia_host, masked=False)
        assert A_m.data_b is None and A_u.mask_b is None
        x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.float32)
        _staged.set()
        # golden spot check
        y_m = np.asarray(spmv_dia_stream(A_m, x))
        y_x = np.asarray(spmv_dia(A_x, x))
        err = np.abs(y_m - y_x).max() / np.abs(y_x).max()
        print(f"  parity masked-vs-xla rel={err:.2e}", flush=True)
        for _ in range(2):
            rate_baked("xla-dia(baked)", lambda v: spmv_dia(A_x, v), x,
                       nnz, 1, (200, 3200))
            rate_baked("stream-masked(baked)",
                       lambda v: spmv_dia_stream(A_m, v), x, nnz, 1,
                       (200, 3200))
            rate_baked("stream-unmasked(baked)",
                       lambda v: spmv_dia_stream(A_u, v), x, nnz, 1,
                       (200, 3200))

    if "B" in STAGES:
        stamp(f"stage B: lap3d-{K} stream regime")
        csr = generators.make_laplacian_grid3d(K,
                                               dtype=np.float32).to_csr()
        n, nnz = csr.num_rows, csr.nnz
        offs = select_diagonals(csr)
        dia_host, rest = partition_dia(csr, offs)
        assert rest.nnz == 0
        print(f"  planes {dia_host.data.size*4/1e6:.0f} MB -> mask "
              f"{n*4/1e6:.0f} MB", flush=True)
        stamp("building device plans...")
        A_m1 = to_device_dia_stream(dia_host, L=1)
        A_u1 = to_device_dia_stream(dia_host, L=1, masked=False)
        A_mL = to_device_dia_stream(dia_host, L=L)
        A_uL = to_device_dia_stream(dia_host, L=L, masked=False)
        assert A_m1.data_b is None and A_u1.mask_b is None
        float(jnp.sum(A_uL.data_b[0, 0, 0]))
        stamp("plans on device")
        key = jax.random.PRNGKey(0)
        _staged.set()

        # L=1 single-RHS (the plane-bound case)
        np1 = padded_cols(A_m1)
        x1m = jax.random.normal(key, (1, np1), jnp.float32)
        np1u = padded_cols(A_u1)
        x1u = x1m[:, :np1u] if np1u <= np1 else jnp.pad(
            x1m, ((0, 0), (0, np1u - np1)))
        for _ in range(2):
            rate_arg("L=1 masked(arg)",
                     lambda Aa, P: spmm_dia_stream_tp(Aa, P), A_m1,
                     x1m, nnz, 1, (20, 200))
            rate_baked("L=1 masked(baked)",
                       lambda P: spmm_dia_stream_tp(A_m1, P), x1m,
                       nnz, 1, (20, 200))
            rate_arg("L=1 unmasked(arg)",
                     lambda Aa, P: spmm_dia_stream_tp(Aa, P), A_u1,
                     x1u, nnz, 1, (20, 200))

        # L=L multi-RHS
        npm = padded_cols(A_mL)
        XTm = jax.random.normal(key, (L, npm), jnp.float32)
        npu = padded_cols(A_uL)
        XTu = XTm[:, :npu] if npu <= npm else jnp.pad(
            XTm, ((0, 0), (0, npu - npm)))
        for _ in range(2):
            rate_arg(f"L={L} masked(arg)",
                     lambda Aa, P: spmm_dia_stream_tp(Aa, P), A_mL,
                     XTm, nnz, L, (4, 40))
            rate_baked(f"L={L} masked(baked)",
                       lambda P: spmm_dia_stream_tp(A_mL, P), XTm,
                       nnz, L, (4, 40))
            rate_arg(f"L={L} unmasked(arg)",
                     lambda Aa, P: spmm_dia_stream_tp(Aa, P), A_uL,
                     XTu, nnz, L, (4, 40))

    print("MASKED DIA AB DONE", flush=True)
