#!/usr/bin/env python
"""W=128 bf16 matvec re-measurement with trust-floor-clearing chains.

The first stage-A readings at (20, 220) put the bf16 op's chain delta
at or below the ~20 ms jitter floor (readings scattered 70-170 us);
(50, 850) puts the delta at ~100 ms. Prints the delta so the trust
criterion is visible in the log.
"""

import functools
import os
import signal
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp


def stamp(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def slope(tag, run, iters):
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
    print(f"  {tag}: {per*1e6:.1f} us/op (delta {(t2-t1)*1e3:.0f} ms)",
          flush=True)
    return per


if __name__ == "__main__":
    import faulthandler

    faulthandler.register(signal.SIGUSR1)
    ok = threading.Event()
    th = threading.Timer(600.0, lambda: (ok.is_set() or os._exit(3)))
    th.daemon = True
    th.start()
    from tpusparse.io.generators import make_variable_stencil
    from tpusparse.ops.spmv import plan_dia_bf16, plan_matrix, spmv

    stamp("build W=128")
    csr = make_variable_stencil(128, dims=3, full=True, seed=2,
                                dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    A32 = plan_matrix(csr, strategy="dia", dtype=np.float32)
    A16 = plan_dia_bf16(csr)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n)
                    .astype(np.float32))
    ok.set()

    @functools.partial(jax.jit, static_argnums=2)
    def chain(A, x0, M):
        def body(_, xc):
            y = spmv(A, xc)
            return y / (jnp.max(jnp.abs(y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, x0)

    res = {}
    for _ in range(3):
        res.setdefault("f32", []).append(slope(
            "f32 ", lambda M: float(jnp.sum(chain(A32, x, M))),
            (50, 850)))
        res.setdefault("bf16", []).append(slope(
            "bf16", lambda M: float(jnp.sum(chain(A16, x, M))),
            (50, 850)))
    f, b = min(res["f32"]), min(res["bf16"])
    stamp(f"W=128 long-chain: f32 {f*1e6:.1f} us ({2*nnz/f/1e9:.0f} "
          f"GF), bf16 {b*1e6:.1f} ({2*nnz/b/1e9:.0f} GF), win "
          f"{f/b:.2f}x")
