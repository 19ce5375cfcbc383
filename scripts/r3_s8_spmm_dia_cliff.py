#!/usr/bin/env python
"""The multi-RHS DIA cliff: CG at L=32 costs 10x L=16 (104.8 vs 10.6
us/iter, same plan). Hypothesis: XLA stops fusing the K-diagonal
accumulation at L=32, materializing acc per diagonal (7 planes x
(acc r+w + slice read) ~ 88 MB/iter ~ 140 us at 621 GB/s). This times
spmm_dia alone over L in a fori chain (plan closed over), and a
lane-chunked variant (split L into <=16 blocks, concatenate).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tpusparse.bench.timing import iter_slope  # noqa: E402
from tpusparse.io import generators  # noqa: E402
from tpusparse.ops.spmv import plan_matrix  # noqa: E402
from tpusparse.ops.dia import spmm_dia  # noqa: E402

_compiled = {}


def chunked_spmm(D, X, width=16):
    L = X.shape[1]
    if L <= width:
        return spmm_dia(D, X)
    outs = [spmm_dia(D, X[:, i:i + width])
            for i in range(0, L, width)]
    return jnp.concatenate(outs, axis=1)


def rate(tag, op, D, X):
    def run(M):
        key = (tag, X.shape[1], M)
        if key not in _compiled:
            def body(i, Y):
                Z = op(D, Y)
                return Z * (1.0 / (1.0 + jnp.float32(1e-6)))
            _compiled[key] = jax.jit(
                lambda X_: jax.lax.fori_loop(0, M, body, X_))
        float(jnp.sum(_compiled[key](X)))

    outs = []
    for _ in range(2):
        st = iter_slope(run, iters=(20, 420), sets=1, reps=3)
        outs.append(st.median_s)
    print(f"{tag} L={X.shape[1]}: {min(outs)*1e6:.2f} us/op")


if __name__ == "__main__":
    csr = generators.make_laplacian_grid3d(32, dtype=np.float32).to_csr()
    A = plan_matrix(csr, dtype=np.float32, L=32)
    D = A.dia
    rng = np.random.default_rng(0)
    n = csr.num_rows
    for L in (8, 16, 24, 32, 64):
        X = jnp.asarray(rng.standard_normal((n, L)).astype(np.float32))
        rate("fused  ", spmm_dia, D, X)
        if L > 16:
            rate("chunk16", chunked_spmm, D, X)
    print("CLIFF DONE")
