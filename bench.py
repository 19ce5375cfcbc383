"""Headline benchmark — prints ONE JSON line.

Metric: fp32 SpMM GFLOP/s (L=32) on a 3-D Laplacian via the best
available strategy, the reference's headline metric
(``cpu_spmm_v2.cpp:876,884``: GFLOP/s = 2*nnz*L/t). ``vs_baseline``
compares against the reference machine's realistic CPU SpMM rate
derived from its own bandwidth model: the i9-9980XE sustains
~80 GB/s; at 20 B/nnz (fp64+idx) that is ~4 Gnnz/s -> at L=32
~256 GFLOP/s ceiling; measured CPU merge-SpMM typically reaches ~50%%
of that. We use 128 GFLOP/s as the baseline denominator.
"""

import json
import sys

import numpy as np


BASELINE_SPMM_GFLOPS = 128.0


def main():
    import jax
    import jax.numpy as jnp

    from tpusparse.bench import models, timing
    from tpusparse.io import generators
    from tpusparse.ops.spmv import spmm

    L = 32
    width = 48  # 110k rows, ~760k nnz
    csr = generators.make_laplacian_grid3d(width, dtype=np.float32).to_csr()

    kind = "reference"
    try:
        from tpusparse.kernels import merge_spmv  # noqa: F401
        from tpusparse.formats.tiles import build_merge_tiles

        tiles = build_merge_tiles(csr)
        if tiles.overflow_fraction < 0.05:
            A = merge_spmv.to_device_tiles(tiles, dtype=np.float32)
            kind = "merge"
        else:
            A = csr.to_device(dtype=np.float32)
    except Exception:
        A = csr.to_device(dtype=np.float32)

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((csr.num_cols, L)).astype(np.float32))

    fn = jax.jit(lambda X: spmm(A, X))
    t = timing.benchmark(fn, X, reps=10, warmup=1)
    gf = models.gflops(models.spmv_flops(csr.nnz, L), t.avg_s)
    print(
        json.dumps(
            {
                "metric": f"spmm_L{L}_gflops_{kind}",
                "value": round(gf, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(gf / BASELINE_SPMM_GFLOPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
