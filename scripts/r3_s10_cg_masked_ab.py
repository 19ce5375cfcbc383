#!/usr/bin/env python
"""Single-RHS CG plan A/B + the XLA-masked DIA candidate (session 10).

Standalone SpMV the masked Pallas stream kernel wins everywhere
(890 vs 243 GF on lap3d-48), but inside a baked CG while_loop XLA
fuses the XLA-DIA plan's shifted FMAs with the BLAS-1 ops, while a
pallas_call is a fusion barrier. Candidate that may beat both: an
XLA-level masked matvec — ``where((m>>k)&1, c_k, 0) * shift(x)`` —
fully fusable AND free of the K-plane fusion-capacity collapse (one
int32 array instead of K value planes).

Stage A: CG device-rate A/B (pinned trips, slope between max_iters):
  masked-stream (auto bake) / unmasked-stream / xla-dia / xla-masked.
Stage B: standalone SpMV rate, xla-masked vs pallas-masked, small
  (lap3d-48) and collapse-regime (lap3d-192) sizes.

Usage: r3_s10_cg_masked_ab.py [stage=AB] [widths=48,112] [bigw=192]
"""

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
from tpusparse.ops.hybrid import HybridPlan
from tpusparse.solvers.cg import _cg_solve_impl, cg_solve

STAGES = sys.argv[1] if len(sys.argv) > 1 else "AB"
WIDTHS = [int(w) for w in (sys.argv[2] if len(sys.argv) > 2
                           else "48,112").split(",")]
BIGW = int(sys.argv[3]) if len(sys.argv) > 3 else 192


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_xla_masked_mv(dia_host):
    """Baked XLA masked DIA matvec: one int32 mask word per row +
    static per-plane scalars; every term an elementwise select-FMA
    over a static slice of the padded x."""
    from tpusparse.formats.dia import plane_constants

    vals, ok = plane_constants(dia_host.data)
    assert ok.all()
    offs = tuple(int(o) for o in dia_host.offsets)
    n = dia_host.num_rows
    mask = np.zeros(n, np.uint32)
    for k in range(len(offs)):
        mask |= (dia_host.data[k] != 0).astype(
            np.uint32) << np.uint32(k)
    m = jnp.asarray(mask.view(np.int32))
    consts = tuple(float(np.float32(v)) for v in vals)
    pad_lo = max(0, -min(offs))
    pad_hi = max(0, max(offs))

    def mv(x):
        xp = jnp.pad(x, (pad_lo, pad_hi))
        acc = jnp.zeros(n, jnp.float32)
        for k, off in enumerate(offs):
            d = jnp.where((m & (1 << k)) != 0,
                          jnp.float32(consts[k]), jnp.float32(0.0))
            sl = jax.lax.slice_in_dim(xp, off + pad_lo,
                                      off + pad_lo + n)
            acc = acc + d * sl
        return acc

    return mv


def rate_cg(tag, solve_of_m, nnz, n, iters=(200, 1200)):
    def run(m):
        r = solve_of_m(m)
        float(jnp.sum(r.x))

    k1, k2 = iters
    run(k1)
    run(k2)

    def t(m):
        t0 = time.perf_counter()
        run(m)
        return time.perf_counter() - t0

    t1 = min(t(k1) for _ in range(3))
    t2 = min(t(k2) for _ in range(3))
    per = max((t2 - t1) / (k2 - k1), 1e-9)
    gf = (2.0 * nnz + 10.0 * n) / per / 1e9
    print(f"  {tag}: {per*1e6:.2f} us/iter, {gf:.1f} GF", flush=True)


def rate_spmv(tag, fn_of_x, x0, nnz, iters):
    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def chain(x, M):
        def body(_, xc):
            y = fn_of_x(xc)
            return y / (jnp.max(jnp.abs(y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, x)

    k1, k2 = iters

    def run(M):
        float(jnp.sum(chain(x0, M)))

    run(k1)
    run(k2)

    def t(M):
        t0 = time.perf_counter()
        run(M)
        return time.perf_counter() - t0

    t1 = min(t(k1) for _ in range(3))
    t2 = min(t(k2) for _ in range(3))
    per = max((t2 - t1) / (k2 - k1), 1e-9)
    gf = 2.0 * nnz / per / 1e9
    print(f"  {tag}: {per*1e6:.2f} us/op, {gf:.1f} GF", flush=True)


def build(w):
    csr = generators.make_laplacian_grid3d(w, dtype=np.float32).to_csr()
    offs = select_diagonals(csr)
    dia_host, rest = partition_dia(csr, offs)
    assert rest.nnz == 0
    return csr, dia_host


if __name__ == "__main__":
    import faulthandler

    faulthandler.register(signal.SIGUSR1)
    _staged = threading.Event()

    def _fire():
        if not _staged.is_set():
            print("STARTUP WEDGE: exiting for retry", flush=True)
            os._exit(3)

    t = threading.Timer(420.0, _fire)
    t.daemon = True
    t.start()

    if "A" in STAGES:
        for w in WIDTHS:
            stamp(f"stage A: lap3d-{w} fp32 CG device-rate A/B")
            csr, dia_host = build(w)
            n, nnz = csr.num_rows, csr.nnz
            A_m = HybridPlan(to_device_dia_stream(dia_host, L=1),
                             None, nnz)
            A_u = HybridPlan(
                to_device_dia_stream(dia_host, L=1, masked=False),
                None, nnz)
            A_x = HybridPlan(
                to_device_dia(dia_host, dtype=np.float32), None, nnz)
            assert A_m.dia.mask_b is not None
            assert A_u.dia.mask_b is None
            mv = make_xla_masked_mv(dia_host)
            b = np.asarray(
                np.random.default_rng(0).standard_normal(n),
                np.float32)
            bj = jnp.asarray(b)

            _xm_cache = {}

            def xm_solve(m):
                fn = _xm_cache.get(m)
                if fn is None:
                    fn = jax.jit(lambda b_: _cg_solve_impl(
                        None, b_, m, 0.0, "auto", None, mv, False))
                    _xm_cache[m] = fn
                return fn(bj)

            _staged.set()
            for _ in range(2):
                rate_cg("masked-stream", lambda m: cg_solve(
                    A_m, b, tolerance=0.0, max_iters=m), nnz, n)
                rate_cg("unmasked-stream", lambda m: cg_solve(
                    A_u, b, tolerance=0.0, max_iters=m), nnz, n)
                rate_cg("xla-dia", lambda m: cg_solve(
                    A_x, b, tolerance=0.0, max_iters=m), nnz, n)
                rate_cg("xla-masked", xm_solve, nnz, n)

    if "B" in STAGES:
        stamp("stage B: standalone SpMV, xla-masked vs pallas-masked")
        for w, iters in ((48, (2000, 14000)), (BIGW, (100, 700))):
            csr, dia_host = build(w)
            n, nnz = csr.num_rows, csr.nnz
            stamp(f"  lap3d-{w} ({nnz/1e6:.1f}M nnz)")
            A_m = HybridPlan(to_device_dia_stream(dia_host, L=1),
                             None, nnz)
            mv = make_xla_masked_mv(dia_host)
            from tpusparse.ops.spmv import spmv

            x0 = jnp.asarray(np.random.default_rng(1)
                             .standard_normal(n).astype(np.float32))
            _staged.set()
            for _ in range(2):
                rate_spmv("pallas-masked",
                          lambda v: spmv(A_m, v), x0, nnz, iters)
                rate_spmv("xla-masked", mv, x0, nnz, iters)

    print("CG MASKED AB DONE", flush=True)
