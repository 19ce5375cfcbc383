"""Headline benchmark — prints ONE JSON line.

Metric: fp32 CSR SpMV GFLOP/s on a 3-D Laplacian (110k rows, 760k nnz)
via the Pallas merge-tile kernel — the reference's headline metric
(``cpu_spmv.cpp:725,733``: GFLOP/s = 2*nnz/t).

Timing: chained-slope methodology (tpusparse.bench.timing) — the
tunneled TPU platform has ~25 ms host<->device round-trip latency and
an unreliable block_until_ready, so per-op time is the slope between
two fori_loop chain lengths. The chip is shared: the headline is the
MEDIAN over several interleaved slope sets (reproducible), with the
spread and best-set value reported alongside.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
denominator is the throughput its own byte model implies on its
i9-9980XE host (~80 GB/s at 20 B/nnz fp64 -> ~4 Gnnz/s -> 8 GFLOP/s),
i.e. the bandwidth-bound ceiling of the reference machine.
``pct_of_roofline``: effective bytes over the measured 650 GB/s
read-dominant stream ceiling of this chip (bench/models.py).
"""

import json

import numpy as np

BASELINE_SPMV_GFLOPS = 8.0


def main():
    import jax.numpy as jnp

    from tpusparse.bench import models
    from tpusparse.bench.timing import slope_time
    from tpusparse.formats.tiles import build_merge_tiles
    from tpusparse.io import generators
    from tpusparse.kernels import merge_spmv
    from tpusparse.ops.spmv import plan_matrix

    width = 48  # 110k rows, ~760k nnz
    csr = generators.make_laplacian_grid3d(width, dtype=np.float32).to_csr()
    A = plan_matrix(csr, strategy="merge", dtype=np.float32)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(csr.num_cols).astype(np.float32))

    st = slope_time(
        # 420-op chain ≈ 17 ms of kernel time: the slope delta clears
        # the tunnel's ms-scale round-trip jitter, which (10, 110)
        # chains did not (spread ~2 under contention)
        lambda v: merge_spmv.spmv_merge(A, v), x, iters=(20, 420),
        sets=8, reps=4,
    )
    per_op = st.median_s
    gf = 2.0 * csr.nnz / max(per_op, 1e-9) / 1e9
    ebytes = models.spmv_bytes(csr.nnz, csr.num_rows, value_bytes=4)
    print(
        json.dumps(
            {
                "metric": "spmv_fp32_merge_gflops",
                "value": round(gf, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(gf / BASELINE_SPMV_GFLOPS, 3),
                "spread": round(st.spread, 3),
                "best_set_gflops": round(
                    2.0 * csr.nnz / max(st.min_s, 1e-9) / 1e9, 2
                ),
                "pct_of_roofline": round(
                    models.roofline_pct(ebytes, per_op), 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
