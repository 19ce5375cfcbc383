#!/usr/bin/env python
"""Solver-level A/B: interleaved-state multi-RHS CG (n-major masked
plan) vs the lane-major transposed CG (masked stream plan) on lap3d.
Same process, interleaved passes; per-iteration cost is the slope
between two pinned max_iters solves at tolerance=0 (the --device_rate
contract). Usage: r3_s12_nmajor_cg_ab.py [W] [L...]
"""

import os
import sys
import threading
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def solve_slope(solve, K1=20, K2=120, reps=3):
    solve(K1), solve(K2)

    def t(M):
        t0 = time.perf_counter()
        solve(M)
        return time.perf_counter() - t0

    t1 = min(t(K1) for _ in range(reps))
    t2 = min(t(K2) for _ in range(reps))
    return max((t2 - t1) / (K2 - K1), 1e-9)


def main():
    from tpusparse.formats.dia import partition_dia, select_diagonals
    from tpusparse.io import generators
    from tpusparse.kernels.dia_nmajor import to_device_dia_nmajor
    from tpusparse.kernels.dia_stream import to_device_dia_stream
    from tpusparse.solvers.cg import cg_solve_multi

    Wd = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    Ls = [int(a) for a in sys.argv[2:]] or [8, 16, 32]
    csr = generators.make_laplacian_grid3d(Wd, dtype=np.float32).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    dia_host, _ = partition_dia(csr, select_diagonals(csr))
    print(f"lap3d-{Wd}: n={n} nnz={nnz}", flush=True)
    rng = np.random.default_rng(0)

    from tpusparse.utils.transfer import device_put_chunked

    for L in Ls:
        B = device_put_chunked(
            rng.standard_normal((n, L)).astype(np.float32))
        B = jax.block_until_ready(B)
        rows = {
            "lane-major-t": to_device_dia_stream(dia_host, L=L,
                                                 masked=True),
            "interleaved ": to_device_dia_nmajor(dia_host, L),
        }
        # flop model: CG iter = SpMM (2 nnz L) + 10 n L BLAS-1
        # (cpu_multicg.cpp:176)
        flops = (2.0 * nnz + 10.0 * n) * L

        for _pass in range(2):
            for tag, A in rows.items():
                def run(M, A=A):
                    r = cg_solve_multi(A, B, max_iters=M, tolerance=0.0)
                    jax.block_until_ready(r.x)
                    float(jnp.sum(r.x))
                try:
                    per = solve_slope(run)
                    print(f"L={L} {tag}: {per*1e6:.1f} us/iter, "
                          f"{flops/per/1e9:.1f} GF", flush=True)
                except Exception as e:
                    print(f"L={L} {tag}: ERROR {type(e).__name__}: "
                          f"{str(e)[:300]}", flush=True)
        del rows


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
