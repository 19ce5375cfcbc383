#!/usr/bin/env python
"""fp64 multi-RHS A/B past DIA_STREAM_F64_MIN_BYTES (lap3d-170:
275 MB of f64 planes): XLA native-f64 DIA (spmm_dia_t) vs the
double-float multi-RHS stream kernel (spmm_dia_stream_df_t).
Decides the f64 stream gate's L range (the f32 crossover is L~16;
f64 emulation shifts it — measure, don't assume)."""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.formats.dia import (
    partition_dia,
    select_diagonals,
    to_device_dia,
)
from tpusparse.io import generators
from tpusparse.kernels.dia_stream import (
    spmm_dia_stream_df_t,
    to_device_dia_stream_df,
)
from tpusparse.ops.dia import spmm_dia_t

K = int(sys.argv[1]) if len(sys.argv) > 1 else 170
L = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def spmm_rate(tag, mm_t_with_plan, A, XT, nnz, iters):
    @functools.partial(jax.jit, static_argnums=2)
    def chain(Aa, X0, M):
        def body(_, X):
            Y = mm_t_with_plan(Aa, X)
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)

        return jax.lax.fori_loop(0, M, body, X0)

    K1, K2 = iters

    def run(M):
        float(jnp.sum(chain(A, XT, M)))

    print(f"[{time.strftime('%H:%M:%S')}] compiling {tag}...",
          flush=True)
    run(K1), run(K2)

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


if __name__ == "__main__":
    jax.config.update("jax_enable_x64", True)
    csr = generators.make_laplacian_grid3d(K, dtype=np.float64).to_csr()
    n, nnz = csr.num_rows, csr.nnz
    offs = select_diagonals(csr)
    dia_host, rest = partition_dia(csr, offs)
    assert rest.nnz == 0
    print(f"lap3d-{K} f64: n={n} nnz={nnz} "
          f"planes={dia_host.data.size*8/1e6:.0f} MB L={L}", flush=True)
    A_df = to_device_dia_stream_df(dia_host)
    float(jnp.sum(A_df.data_hi[0, 0, 0]))
    A_xla = to_device_dia(dia_host, dtype=np.float64)
    float(jnp.sum(A_xla.data[0, :8]))
    del dia_host
    print("plans on device", flush=True)

    from tpusparse.kernels.dia_stream import (
        padded_cols_df,
        spmm_dia_stream_df_tp,
    )

    key = jax.random.PRNGKey(0)
    XT = jax.random.normal(key, (L, n), jnp.float64)
    np_ = padded_cols_df(A_df)
    XTP = jnp.pad(XT, ((0, 0), (0, np_ - n)))
    for _ in range(2):
        spmm_rate("df-edge-tp(padded)",
                  lambda Aa, P: spmm_dia_stream_df_tp(Aa, P), A_df,
                  XTP, nnz, iters=(3, 15))
        spmm_rate("df-edge-t(wrap)",
                  lambda Aa, P: spmm_dia_stream_df_t(Aa, P), A_df,
                  XT, nnz, iters=(3, 15))
        spmm_rate("xla-f64(old)",
                  lambda Aa, P: spmm_dia_t(Aa, P), A_xla,
                  XT, nnz, iters=(2, 8))
    print("F64 STREAM AB DONE", flush=True)
