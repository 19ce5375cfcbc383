#!/usr/bin/env python
"""A/B of the multi-RHS stream hole fix (ROADMAP "REMAINING HOLE"):
stencils whose DIA planes exceed the XLA fusion scale (lap3d-180:
163 MB > DIA_STREAM_MIN_BYTES) used to plan as a plain DiaDevice for
L > 1 — transposed-path CG then runs spmm_dia_t (XLA shifted slices)
with the plan as a jit argument, the collapsed regime. The fix plans
a DiaStreamDevice at any L and routes the transposed solvers through
spmm_dia_stream_t.

Measures, same process, interleaved:
  1. spmm alone at L=32: spmm_dia_t (old) vs spmm_dia_stream_t (new)
  2. cg_solve_multi device rate (pinned trips) on both plans
RHS generated on device (748 MB host payloads would crawl through the
tunnel).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope, slope_time
from tpusparse.formats.dia import partition_dia, select_diagonals, to_device_dia
from tpusparse.io import generators
from tpusparse.kernels.dia_stream import to_device_dia_stream
from tpusparse.solvers.cg import cg_solve_multi

import sys

K = int(sys.argv[1]) if len(sys.argv) > 1 else 180
L = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def spmm_rate(tag, mm_t_with_plan, A, XT, nnz, iters):
    """Chained slope with the PLAN AS A JIT ARGUMENT (the production
    dispatch for >64 MB plans; a closure constant of 163 MB would ship
    through remote_compile and crawl/413 on the tunnel)."""
    import functools
    import time

    @functools.partial(jax.jit, static_argnums=2)
    def chain(Aa, X0, M):
        def body(_, X):
            Y = mm_t_with_plan(Aa, X)
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, X0)

    K1, K2 = iters

    def run(M):
        float(jnp.sum(chain(A, XT, M)))

    import time as _time
    print(f"[{_time.strftime('%H:%M:%S')}] compiling {tag} K1...",
          flush=True)
    run(K1)
    print(f"[{_time.strftime('%H:%M:%S')}] compiling {tag} K2...",
          flush=True)
    run(K2)
    print(f"[{_time.strftime('%H:%M:%S')}] timing {tag}", flush=True)

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(3))
    t2 = min(t(K2) for _ in range(3))
    per = max((t2 - t1) / (K2 - K1), 1e-9)
    gf = 2.0 * nnz * L / per / 1e9
    print(f"  spmm {tag}: {per*1e6:.1f} us/matvec, {gf:.1f} GF",
          flush=True)
    return per


def cg_rate(tag, A, B, nnz, n, iters):
    def run(M):
        r = cg_solve_multi(A, B, max_iters=M, tolerance=0.0)
        float(jnp.sum(r.x))

    outs = []
    for _ in range(3):
        st = iter_slope(run, iters=iters, sets=1, reps=3)
        outs.append(st.median_s)
    t = min(outs)
    gf = (2.0 * nnz + 10.0 * n) * L / t / 1e9
    print(f"  cg {tag}: {t*1e6:.1f} us/iter, {gf:.1f} GF", flush=True)
    return t


if __name__ == "__main__":
    import faulthandler
    import os
    import signal
    import threading

    faulthandler.register(signal.SIGUSR1)

    # per-process tunnel wedge (see CLAUDE.md): if device staging
    # doesn't complete quickly, exit so a supervisor can retry in a
    # fresh process (where the same ops run in seconds).
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE: device staging stuck, exiting for "
                  "retry", flush=True)
            os._exit(3)

    _t = threading.Timer(300.0, _fire)
    _t.daemon = True
    _t.start()

    jax.config.update("jax_enable_x64", True)
    csr = generators.make_laplacian_grid3d(K, dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    offs = select_diagonals(csr)
    dia_host, rest = partition_dia(csr, offs)
    assert rest.nnz == 0
    plane_mb = dia_host.data.size * 4 / 1e6
    print(f"lap3d-{K}: n={n} nnz={nnz} planes={plane_mb:.0f} MB", flush=True)

    import time as _time

    def stamp(msg):
        print(f"[{_time.strftime('%H:%M:%S')}] {msg}", flush=True)

    stamp("building device plans...")
    A_new = to_device_dia_stream(dia_host, L=L)
    float(jnp.sum(A_new.data_b[0, 0, 0]))  # sync the upload
    stamp("stream plan on device")
    A_old = to_device_dia(dia_host, dtype=np.float32)
    float(jnp.sum(A_old.data[0, :8]))
    stamp("xla-dia plan on device")
    del dia_host

    key = jax.random.PRNGKey(0)
    XT = jax.random.normal(key, (L, n), jnp.float32)
    float(jnp.sum(XT[:, :8]))
    stamp("XT generated")
    _staged.set()
    from tpusparse.kernels.dia_stream import (
        padded_cols,
        spmm_dia_stream_t,
        spmm_dia_stream_tp,
    )
    from tpusparse.ops.dia import spmm_dia_t

    np_ = padded_cols(A_new)
    XTP = jnp.pad(XT, ((0, 0), (0, np_ - n)))
    for _ in range(2):
        spmm_rate("stream-edge(tp)",
                  lambda Aa, P: spmm_dia_stream_tp(Aa, P, mxu=False),
                  A_new, XTP, nnz, iters=(4, 40))
        spmm_rate("stream-edge-mxu(tp)",
                  lambda Aa, P: spmm_dia_stream_tp(Aa, P, mxu=True),
                  A_new, XTP, nnz, iters=(4, 40))
        spmm_rate("xla-dia(old)",
                  lambda Aa, P: spmm_dia_t(Aa, P), A_old,
                  XT, nnz, iters=(2, 12))
    del XT, XTP

    Bmat = jax.random.normal(key, (n, L), jnp.float32)
    for _ in range(2):
        cg_rate("stream(new)", A_new, Bmat, nnz, n, iters=(5, 45))
        cg_rate("xla-dia(old)", A_old, Bmat, nnz, n, iters=(2, 10))
    print("STREAM MRHS AB DONE", flush=True)
