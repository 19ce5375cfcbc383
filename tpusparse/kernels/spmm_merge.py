"""Pallas multi-RHS merge-tile SpMM — in-kernel RHS lanes.

TPU re-design of the reference's first-class multi-RHS merge kernel
``OmpMergeCsrmm`` (``/root/reference/work_2025/spmm/merge_based.hpp:
49-153``: merge-path work split, ``#pragma omp simd`` over the RHS
lanes). Round 1 shipped a ``lax.map``-over-columns wrapper that
re-streamed the tile payload L times (10 GFLOP/s at L=32); this kernel
streams the payload ONCE and keeps every per-tile hardware gather
independent of L:

  * the tile payload is ROW-major (slot p -> (p//128, p%128), shared
    with the SpMV kernel): one sublane row = 128 consecutive slots
    riding the lanes, so ONE ``take_along_axis`` on the (L, 128) RHS
    block gathers a slot row's x values for ALL L RHS lanes at once —
    the ELL kernel's trick applied to the merge layout. Per tile:
    8 * gather_rows gathers, independent of L;
  * scan: within-slot-row lane prefix (7 shift-adds on (L, 8*128)) +
    a sequential 8-step inter-row carry — an L-vectorized re-expression
    of the reference's BlockScan reduce-by-key
    (``agent_spmv_orig.cuh:370``);
  * extraction at the (lane-shared) end positions: 8 gathers + selects
    per 128-row window serve all L lanes;
  * accumulation: (row_span, L, 128) partials (row-anchored, see
    merge_spmv) accumulate into the revisited output block — TPU grid
    steps are sequential, no fixup kernel.

Operand: the SAME DeviceTiles as the SpMV kernel (one plan serves
both). The RHS block is lane-chunked to the VMEM budget exactly like
the ELL kernel.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.kernels._util import kernel_no_x64, tala32
from tpusparse.kernels.merge_spmv import (
    DeviceTiles,
    _interpret,
    _lane_iota,
)
from tpusparse.formats.tiles import LANES, SUBLANES

TILES_PER_STEP_SPMM = 8  # divides every per-matrix pad multiple
                         # (to_device_tiles pads to a multiple of 8)


@kernel_no_x64
def _spmm_kernel(gather_rows: int, rspan: int, L: int, T: int,
                 use_blk: bool,
                 rblk_ref, cblk_ref, cspan_ref,
                 vals_ref, lc_ref, ep_ref, x_ref, y_ref):
    """``use_blk`` (static): cblk_ref is the per-tile block LIST
    (merge_spmv.DeviceTiles.blk_list) and each gather iteration reads
    the (L, 128) RHS row it names; otherwise cblk_ref is the contiguous
    window anchor (see merge_spmv._gather_blocks)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    li = _lane_iota((L, LANES))
    # (128,128) upper-triangular ones: P @ tri = inclusive lane prefix.
    # The MXU does the scan — 7 masked lane-rolls per slot row measured
    # 6x slower than this single matmul per tile.
    jj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tri = (jj <= kk).astype(x_ref.dtype)

    for u in range(T):
        t = step * T + u
        if use_blk:
            # per-qq (1, L, 128) dynamic slices named by the block list
            win = [x_ref[pl.ds(cblk_ref[t, qq], 1)][0]
                   for qq in range(gather_rows)]
        else:
            w = x_ref[pl.ds(cblk_ref[t], gather_rows)]  # (gr, L, 128)
            win = [w[qq] for qq in range(gather_rows)]
        # per slot row i: one (L,128) gather per window row serves all
        # L RHS lanes
        prows = []
        for i in range(SUBLANES):
            # int16 payload -> register upcast (halved index traffic)
            lc_i = lc_ref[u, i : i + 1, :].astype(jnp.int32)  # (1, 128)
            b = jnp.broadcast_to(lc_i % LANES, (L, LANES))
            q = jnp.broadcast_to(lc_i // LANES, (L, LANES))
            g = jnp.zeros((L, LANES), x_ref.dtype)
            for qq in range(gather_rows):
                cand = tala32(win[qq], b, axis=1)
                g = jnp.where(q == qq, cand, g)
            prows.append(
                jnp.broadcast_to(vals_ref[u, i : i + 1, :],
                                 (L, LANES)) * g
            )
        # one MXU matmul scans every slot row for every RHS lane (a
        # step-wide batched matmul measured SLOWER — 27 vs 36 GF — the
        # big concat intermediate defeats per-tile pipelining)
        S = jax.lax.dot_general(
            jnp.concatenate(prows, axis=0), tri,
            (((1,), (0,)), ((), ())),
            preferred_element_type=x_ref.dtype,
            # bf16x3 passes: default precision runs one bf16 pass and
            # costs ~8 mantissa bits on the prefix sums (err 2e-3)
            precision=jax.lax.Precision.HIGHEST,
        )                                              # (8L, 128)
        cs_rows = []
        carry = jnp.zeros((L, 1), x_ref.dtype)
        for i in range(SUBLANES):
            p = S[i * L : (i + 1) * L] + jnp.broadcast_to(
                carry, (L, LANES)
            )
            carry = p[:, LANES - 1 :]
            cs_rows.append(p)

        # extraction at the shared end positions + row differences
        prev_last = jnp.zeros((L, 1), x_ref.dtype)
        parts = []
        for w in range(rspan):
            ep = ep_ref[u, w : w + 1, :].astype(jnp.int32)    # (1, 128)
            epc = jnp.maximum(ep, 0)
            g_e = jnp.broadcast_to(epc // LANES, (L, LANES))
            j_e = jnp.broadcast_to(epc % LANES, (L, LANES))
            G = jnp.zeros((L, LANES), x_ref.dtype)
            for i in range(SUBLANES):
                cand = tala32(cs_rows[i], j_e, axis=1)
                G = jnp.where(g_e == i, cand, G)
            G = jnp.where(jnp.broadcast_to(ep, (L, LANES)) < 0, 0.0, G)
            Gprev = jnp.where(
                li >= 1, jnp.roll(G, 1, axis=1),
                jnp.broadcast_to(prev_last, (L, LANES)),
            )
            parts.append(G - Gprev)
            prev_last = G[:, LANES - 1 :]
        part = (jnp.stack(parts, axis=0) if rspan > 1
                else parts[0][None])                   # (rspan, L, 128)
        rb = rblk_ref[t]
        y_ref[pl.ds(rb, rspan)] = y_ref[pl.ds(rb, rspan)] + part


@functools.partial(jax.jit, static_argnames=("mb", "T"))
@kernel_no_x64
def _spmm_tiles(A: DeviceTiles, x3, mb: int, T: int):
    """x3: (Ncb, L, 128); returns (mb, L, 128)."""
    L = x3.shape[1]
    steps = A.ntiles // T
    rspan = A.row_span
    csize = 1024 // SUBLANES

    from tpusparse.kernels.merge_spmv import _vmem_params

    itemsize = np.dtype(A.dtype).itemsize
    use_blk = A.blk_list is not None
    y3 = pl.pallas_call(
        functools.partial(_spmm_kernel, A.gather_rows, rspan, L, T,
                          use_blk),
        compiler_params=_vmem_params(
            (x3.size + mb * L * LANES) * itemsize, T, rspan,
            idx_bytes=np.dtype(A.local_cols.dtype).itemsize),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((T, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((T, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((T, rspan, LANES),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec(x3.shape, lambda i, rb, cb, cs: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (mb, L, LANES), lambda i, rb, cb, cs: (0, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((mb, L, LANES), A.vals.dtype),
        interpret=_interpret(),
    )(A.row_block, A.blk_list if use_blk else A.col_block, A.col_span,
      A.vals, A.local_cols, A.end_pos, x3)
    return y3


def _to_x3(A: DeviceTiles, X):
    """(num_cols, L) -> (Ncb, L, 128) with the window-gather row pad."""
    L = X.shape[1]
    ncb = -(-A.num_cols // LANES) + A.x_pad_rows
    Xp = jnp.zeros((ncb * LANES, L), dtype=A.dtype)
    Xp = Xp.at[: A.num_cols].set(X.astype(A.dtype))
    return jnp.transpose(Xp.reshape(ncb, LANES, L), (0, 2, 1))


def spmm_merge(A, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y, X (num_cols, L), via the in-kernel
    multi-RHS merge pipeline (+ jnp overflow stream). ``A``:
    DeviceTiles or ClassedTiles (summed per-span-class kernels)."""
    from tpusparse.kernels.merge_spmv import ClassedTiles

    if isinstance(A, ClassedTiles):
        Y_new = spmm_merge(A.plans[0], X)
        for p in A.plans[1:]:
            Y_new = Y_new + spmm_merge(p, X)
        if beta == 0.0 or Y is None:
            return alpha * Y_new
        return alpha * Y_new + beta * Y
    squeeze = False
    if X.ndim == 1:
        X = X[:, None]
        squeeze = True
    L = X.shape[1]
    Lp = max(-(-L // 8) * 8, 8)   # Mosaic sublane tile constraint
    if Lp != L:
        X = jnp.concatenate(
            [X, jnp.zeros((X.shape[0], Lp - L), X.dtype)], axis=1
        )
    from tpusparse.kernels.ell_spmm import X_VMEM_BUDGET_BYTES

    itemsize = np.dtype(A.dtype).itemsize
    ncb = -(-A.num_cols // LANES) + A.x_pad_rows
    mb = -(-A.num_rows // LANES) + A.y_pad_rows
    # both the RHS block and the output block live in VMEM
    per_lane = (ncb + mb) * LANES * itemsize
    max_lanes = max((X_VMEM_BUDGET_BYTES // per_lane) // 8 * 8, 8)
    T = TILES_PER_STEP_SPMM
    outs = []
    for s in range(0, Lp, max_lanes):
        chunk = X[:, s : s + max_lanes]
        Lc = chunk.shape[1]
        x3 = _to_x3(A, chunk)
        y3 = _spmm_tiles(A, x3, mb, T)
        outs.append(jnp.transpose(y3, (0, 2, 1)).reshape(-1, Lc))
    Y_new = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    Y_new = Y_new[: A.num_rows, :L]
    if A.ovf_vals.shape[0] > 0:
        from tpusparse.ops.reference import spmm_coo

        Y_new = Y_new + spmm_coo(
            A.ovf_rows, A.ovf_cols, A.ovf_vals,
            X[:, :L].astype(A.dtype), A.num_rows,
        )
    if squeeze:
        Y_new = Y_new[:, 0]
        if Y is not None and Y.ndim > 1:
            Y = Y[:, 0]
    if beta == 0.0 or Y is None:
        return alpha * Y_new
    return alpha * Y_new + beta * Y
