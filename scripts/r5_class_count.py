#!/usr/bin/env python
"""Span-class-count A/B (round 5 follow-up to the gap accounting).

The merge-gap decomposition measured dispatch (3 pallas_calls +
combine) at 10.1 us = 18% of the lap3d-48 row but only 3% of
rmat-16. If 2 classes keep most of the span-proportional win while
dropping a dispatch, the small-matrix row improves. Same process,
interleaved: span_classes in {1, 2, 3 (default), 4}.

Usage: r5_class_count.py [fixture=lap3d48|rmat16|both]
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

FIX = sys.argv[1] if len(sys.argv) > 1 else "both"


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def slope(tag, run, iters=(20, 220)):
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
    print(f"  {tag}: {per*1e6:.1f} us", flush=True)
    return per


def ab(name, csr):
    from tpusparse.formats.tiles import choose_partition
    from tpusparse.kernels import merge_spmv as M
    from tpusparse.kernels.merge_spmv import ClassedTiles, spmv_merge

    host = choose_partition(csr)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal(csr.num_cols).astype(np.float32))
    ref = csr.to_scipy() @ np.asarray(x)

    @functools.partial(jax.jit, static_argnums=2)
    def chain(Aa, x0, K):
        def body(_, xc):
            yy = spmv_merge(Aa, xc)
            return yy / (jnp.max(jnp.abs(yy)) + 1.0)

        return jax.lax.fori_loop(0, K, body, x0)

    plans = {}
    for sc in (1, 2, 3, 4):
        A = M.to_device_tiles(host, dtype=np.float32, span_classes=sc)
        ncls = len(A.plans) if isinstance(A, ClassedTiles) else 1
        y = np.asarray(spmv_merge(A, x))
        rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1)
        assert rel < 2e-5, (sc, rel)
        plans[sc] = (A, ncls)
    res = {}
    for _ in range(2):
        for sc, (A, ncls) in plans.items():
            res.setdefault(sc, []).append(slope(
                f"{name} sc={sc} (classes={ncls})",
                lambda K: float(jnp.sum(chain(A, x, K)))))
    stamp(f"{name} best: " + ", ".join(
        f"sc={sc}: {min(v)*1e6:.1f} us" for sc, v in res.items()))


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

    from tpusparse.io import generators

    _staged.set()
    if FIX in ("lap3d48", "both"):
        ab("lap3d-48", generators.make_laplacian_grid3d(
            48, dtype=np.float32).to_csr())
    if FIX in ("rmat16", "both"):
        ab("rmat-16", generators.make_rmat(
            16, seed=0, dtype=np.float32).to_csr())
