#!/usr/bin/env python
"""In-situ stage ablation of the merge SpMV kernel (round 4).

Forks the production `_fused_kernel` (kernels/merge_spmv.py) with
stage toggles and times each variant on the SAME plan in the SAME
process (shared-chip rule) — the decisive cost decomposition the
round-4 VERDICT item 1 asks for before (or instead of) new kernel
work. Variants:

  full        — the production kernel
  no_gather   — x-window select-loop replaced by vals alone (gather +
                mask + FMA removed; scan/extract/y intact)
  no_extract  — per-tile extraction + row-diff replaced by a cheap
                static slice of CS (gather + scan + y intact)
  no_scan     — MXU prefix sum removed (products used directly)
  no_y        — y read-modify-write replaced by a STATIC write to
                block 0 (measures the dynamic sublane-addressed RMW)
  static_y    — like full but y written at static offset 0 (keeps the
                read-modify-write, removes only the dynamic indexing)

All variants compute WRONG numbers (except full); only their times
matter. Fixtures: lap3d-48 (the bench.py merge row) and rmat-16 (the
scattered flagship).
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
from tpusparse.kernels._util import kernel_no_x64
from tpusparse.kernels import merge_spmv as M

LANES = M.LANES
SUBLANES = M.SUBLANES
TILE_NNZ = M.TILE_NNZ


@kernel_no_x64
def _ablate_kernel(variant, gather_rows, rspan, tps, use_blk,
                   rblk_ref, cblk_ref, cspan_ref,
                   vals_ref, lc_ref, ep_ref, x_ref, y_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    ps = []
    for u in range(tps):
        t = step * tps + u
        lc = lc_ref[u].astype(jnp.int32)
        if variant == "no_gather":
            ps.append(vals_ref[u] + lc.astype(x_ref.dtype) * 0.0)
        else:
            if use_blk:
                g = M._gather_blocks(x_ref, cblk_ref, t, lc,
                                     gather_rows)
            else:
                g = M._gather_window(x_ref, cblk_ref[t], lc,
                                     gather_rows)
            ps.append(vals_ref[u] * g)
    if variant == "no_scan":
        cs = jnp.concatenate(ps, axis=0)
    else:
        cs = M._prefix_sum_mxu(jnp.concatenate(ps, axis=0),
                               x_ref.dtype)

    for u in range(tps):
        t = step * tps + u
        csu = cs[u * SUBLANES:(u + 1) * SUBLANES]
        if variant == "no_extract":
            part = csu[0:rspan] if rspan <= SUBLANES else \
                jnp.concatenate([csu] * (-(-rspan // SUBLANES)),
                                axis=0)[0:rspan]
        else:
            G = M._extract_rows(csu, ep_ref[u])
            part = M._row_diff(G)
        if variant in ("no_y", "static_y"):
            y_ref[pl.ds(0, rspan), :] = (
                part if variant == "no_y"
                else y_ref[pl.ds(0, rspan), :] + part)
        else:
            rb = rblk_ref[t]
            y_ref[pl.ds(rb, rspan), :] = (
                y_ref[pl.ds(rb, rspan), :] + part)


@functools.partial(jax.jit, static_argnames=("variant", "nrows_out"))
@kernel_no_x64
def _spmv_ablate(A, x2d, variant, nrows_out):
    ntiles = A.ntiles
    tps = A.tiles_per_step
    steps = ntiles // tps
    rspan = A.row_span
    csize = TILE_NNZ // SUBLANES
    mb = nrows_out // LANES
    use_blk = A.blk_list is not None
    y2d = pl.pallas_call(
        functools.partial(_ablate_kernel, variant, A.gather_rows,
                          rspan, tps, use_blk),
        compiler_params=M._vmem_params(
            x2d.size * x2d.dtype.itemsize
            + mb * LANES * np.dtype(A.vals.dtype).itemsize, tps, rspan,
            idx_bytes=np.dtype(A.local_cols.dtype).itemsize),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((tps, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((tps, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((tps, rspan, LANES),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec(x2d.shape, lambda i, rb, cb, cs: (0, 0)),
            ],
            out_specs=pl.BlockSpec((mb, LANES),
                                   lambda i, rb, cb, cs: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((mb, LANES), A.vals.dtype),
        interpret=M._interpret(),
    )(A.row_block, A.blk_list if use_blk else A.col_block, A.col_span,
      A.vals, A.local_cols, A.end_pos, x2d)
    return y2d


def ablate_spmv(A, x, variant):
    if isinstance(A, M.ClassedTiles):
        y = ablate_spmv(A.plans[0], x, variant)
        for p in A.plans[1:]:
            y = y + ablate_spmv(p, x, variant)
        return y
    x2d = M._pad_x(A, x.astype(A.dtype))
    mb = -(-A.num_rows // LANES) + A.y_pad_rows
    return _spmv_ablate(A, x2d, variant, mb * LANES).reshape(-1)[:1]


def main():
    from tpusparse.io import generators
    from tpusparse.ops.spmv import plan_matrix

    fixtures = {
        "lap3d_48": generators.make_laplacian_grid3d(
            48, dtype=np.float32).to_csr(),
        "rmat_16": generators.make_rmat(16, dtype=np.float32).to_csr(),
    }
    variants = ["full", "no_gather", "no_extract", "no_scan",
                "static_y", "no_y"]
    for name, csr in fixtures.items():
        A = plan_matrix(csr, strategy="merge", dtype=np.float32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            csr.num_cols).astype(np.float32))
        base = None
        for v in variants:
            st = slope_time(lambda w, v=v: ablate_spmv(A, w, v) * 0.0
                            + w, x, iters=(20, 420), sets=5, reps=3)
            per = st.min_s
            gf = 2 * csr.nnz / per / 1e9
            if v == "full":
                base = per
            delta = (base - per) / base * 100 if base else 0.0
            print(f"{name:9s} {v:11s} {per*1e6:9.1f} us  {gf:6.1f} GF"
                  f"  -{delta:5.1f}%  spread {st.spread:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
