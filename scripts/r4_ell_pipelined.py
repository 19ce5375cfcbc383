#!/usr/bin/env python
"""SpMM experiment (round-4 VERDICT item 5): pipelined job-grid ELL.

The production gather-job kernel (kernels/ell_spmm.py) reads each
job's (L, 128) x-block with an in-kernel dynamic index — profiled at
~50% of kernel time (dynamic sublane-addressed VMEM reads). This
variant moves the job's x-block into a BlockSpec whose index map reads
the job's column block from scalar prefetch: Pallas's grid pipeline
then double-buffers the fetch ACROSS grid steps (and skips it entirely
when consecutive jobs share a block — job order is (row block, cblk,
rank), so same-cblk runs are common). The trade: per-grid-step
overhead on a (ntiles * J)-step grid and HBM re-fetch traffic of
~128 B/nnz when x does not stay VMEM-resident, bounding this variant
at ~4.8 Gnnz/s on the 621 GB/s stream — above the production kernel's
measured 2.8 Gnnz/s at L=32 if the pipeline holds.

Measures production spmm_ell vs the pipelined variant, same process,
on lap3d-32 at L in (8, 32, 64). Correctness pinned against scipy in
interpret mode (run with JAX_PLATFORMS=cpu for the check only).
"""

import functools
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpusparse.bench.timing import slope_time
from tpusparse.kernels._util import kernel_no_x64, tala32
from tpusparse.kernels import ell_spmm as E

LANES = 128


def _interpret():
    return jax.default_backend() != "tpu"


@kernel_no_x64
def _pipe_kernel(J, L, rb_ref, new_ref, cblk_ref, lc_ref, vals_ref,
                 xblk_ref, y_ref):
    t = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((new_ref[t] == 1) & (j == 0))
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    b = jnp.broadcast_to(lc_ref[0, 0, :][None, :], (L, LANES))
    cand = tala32(xblk_ref[0], b, axis=1)
    v = jnp.broadcast_to(vals_ref[0, 0, :][None, :], (L, LANES))
    y_ref[0] = y_ref[0] + cand * v


# payload arrays reshape to (ntiles*J, 1, 128) so the (1, 1, 128)
# blocks satisfy Mosaic's last-two-dims rule (second-to-last block dim
# must divide by 8 or equal the array dim)


@functools.partial(jax.jit, static_argnames=("mb",))
@kernel_no_x64
def _spmm_pipe(A, x3, mb: int):
    from tpusparse.kernels.merge_spmv import _vmem_params

    L = x3.shape[1]
    J = A.jobs_per_tile
    itemsize = np.dtype(A.dtype).itemsize
    y3 = pl.pallas_call(
        functools.partial(_pipe_kernel, J, L),
        compiler_params=_vmem_params(
            (4 * L * LANES + mb * L * LANES) * itemsize, 4, 1),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # rb, new, job_cblk
            grid=(A.ntiles, J),
            in_specs=[
                pl.BlockSpec((1, 1, LANES),
                             lambda t, j, rb, nw, cb: (t * J + j, 0, 0)),
                pl.BlockSpec((1, 1, LANES),
                             lambda t, j, rb, nw, cb: (t * J + j, 0, 0)),
                pl.BlockSpec(
                    (1, L, LANES),
                    lambda t, j, rb, nw, cb: (cb[t * J + j], 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, L, LANES), lambda t, j, rb, nw, cb: (rb[t], 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((mb, L, LANES), A.vals.dtype),
        interpret=_interpret(),
    )(A.row_block, A.new_block, A.job_cblk,
      A.local_cols.reshape(-1, 1, LANES), A.vals.reshape(-1, 1, LANES),
      x3)
    return y3


def spmm_pipe(A, X):
    L = X.shape[1]
    Lp = max(-(-L // 8) * 8, 8)
    if Lp != L:
        X = jnp.concatenate(
            [X, jnp.zeros((X.shape[0], Lp - L), X.dtype)], axis=1)
    x3 = E._to_x3(A, X)
    mb = -(-A.num_rows // LANES)
    y3 = _spmm_pipe(A, x3, mb)
    return jnp.transpose(y3, (0, 2, 1)).reshape(-1, Lp)[:A.num_rows, :L]


def main():
    from tpusparse.formats.ell import build_ell_tiles
    from tpusparse.io import generators

    csr = generators.make_laplacian_grid3d(32, dtype=np.float32).to_csr()
    A = E.to_device_ell(build_ell_tiles(csr), dtype=np.float32)
    S = csr.to_scipy()
    rng = np.random.default_rng(0)
    for L in (8, 32, 64):
        X = rng.standard_normal((csr.num_cols, L)).astype(np.float32)
        Xd = jnp.asarray(X)
        ref = S @ X
        for tag, fn in (("prod", lambda V: E.spmm_ell(A, V)),
                        ("pipe", lambda V: spmm_pipe(A, V))):
            Y = np.asarray(fn(Xd))
            err = np.abs(Y - ref).max() / np.abs(ref).max()
            st = slope_time(fn, Xd, iters=(4, 40), sets=4, reps=3)
            gf = 2 * csr.nnz * L / st.min_s / 1e9
            print(f"L={L:3d} {tag}  {st.min_s*1e6:9.1f} us  "
                  f"{gf:7.1f} GF  err {err:.1e}  spread {st.spread:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
