"""Double-float merge-tile SpMV — fp64 for scattered matrices.

The reference benches in fp64 by default (``cpu_spmv.cpp:979-986``) on
SuiteSparse-class scattered matrices; Mosaic has no 64-bit types, so
fp64 rides two-f32 double-float arithmetic (``kernels/ell_df.py``).
The df-ELL kernel collapses on heavy row skew (R-MAT: 6 nnz/job,
0.33 GF) because its job count explodes across column blocks — the
merge-tile formulation is skew-insensitive by construction, but its
f32 kernel sums rows through an MXU prefix scan whose f32 accumulation
cannot carry Dekker precision.

This kernel keeps the merge pipeline (same MergeTiles plan, same
gather / extraction / row-diff structure as ``kernels/merge_spmv.py``)
and replaces the MXU scan with a Hillis-Steele register scan over
double-float pairs: 7 lane steps + 3 tile-local sublane-carry steps,
every addition a compensated Knuth two-sum (``_df_add``). A df_add
rounds at ~2^-48 relative, so the log-depth tree keeps ~1e-14 overall;
row sums are then differences of the df prefix at host-precomputed end
positions, extracted from BOTH planes. ~5-6x the f32 kernel's per-tile
cost — orders of magnitude ahead of the XLA fp64 gather path and ~8x
the df-ELL kernel on skewed graphs.

Accuracy semantics: ~1e-14 relative with f32 exponent range (NOT
strict IEEE fp64), like every df kernel here; prefix-difference
cancellation adds |prefix|/|row_sum| amplification on top, bounded in
practice by the tile's 1024-slot window.

Reference capability: fp64 default mode of the SpMV drivers
(``cpu_spmv.cpp:750-923``) over the merge strategy
(``merge-based CsrMV, cub/agent/agent_spmv_orig.cuh:289-406``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusparse.formats.tiles import MergeTiles, LANES, SUBLANES
from tpusparse.kernels._util import kernel_no_x64
from tpusparse.kernels.ell_df import _df_add, _two_prod, split_f64
from tpusparse.kernels.merge_spmv import (
    TILE_NNZ,
    ClassedTiles,
    DeviceTiles,
    _extract_rows,
    _gather_window,
    _interpret,
    _lane_iota,
    _pad_x,
    _sublane_iota,
    _vmem_params,
    to_device_tiles,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DfMergeTiles:
    """Double-float merge plan: the hi plan is a normal f32
    DeviceTiles/ClassedTiles (vals = f64 values rounded to f32 — exactly
    ``split_f64``'s hi plane; its overflow stream keeps f64); ``lo``
    holds the matching lo value planes, one per class, sharing the hi
    plan's index arrays."""

    hi: Any            # DeviceTiles | ClassedTiles (f32 vals, empty ovf)
    lo: Any            # tuple of (ntiles_pad, 8, 128) f32 arrays
    ovf_rows: Any      # COO overflow stream, summed outside the kernel
    ovf_cols: Any      # at genuine f64 (XLA under x64)
    ovf_vals: Any

    def tree_flatten(self):
        return ((self.hi, self.lo, self.ovf_rows, self.ovf_cols,
                 self.ovf_vals), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_rows(self):
        return self.hi.num_rows

    @property
    def num_cols(self):
        return self.hi.num_cols

    @property
    def nnz(self):
        return self.hi.nnz

    @property
    def dtype(self):
        return np.dtype(np.float64)  # semantic operand dtype


def to_device_tiles_df(tiles: MergeTiles, **kwargs) -> DfMergeTiles:
    """Build the df plan from a host MergeTiles with f64 values.

    Two identical-layout uploads (hi = f32 rounding of the values, lo =
    the f32 residual); ``to_device_tiles`` is deterministic, so tile
    order, padding, and span classes match exactly and the lo planes
    align slot-for-slot with the hi plan."""
    if not jax.config.jax_enable_x64:
        raise TypeError(
            "the double-float merge plan requires jax_enable_x64=True"
        )
    vals64 = np.asarray(tiles.vals, dtype=np.float64)
    hi_h, lo_h = split_f64(vals64)
    ovf64 = np.asarray(tiles.ovf_vals, dtype=np.float64)
    no_ovf = dict(ovf_rows=np.zeros(0, dtype=np.int32),
                  ovf_cols=np.zeros(0, dtype=np.int32),
                  ovf_vals=np.zeros(0, dtype=np.float64))

    t_hi = dataclasses.replace(tiles, vals=hi_h.astype(np.float64),
                               **no_ovf)
    t_lo = dataclasses.replace(tiles, vals=lo_h.astype(np.float64),
                               **no_ovf)
    plan_hi = to_device_tiles(t_hi, dtype=np.float32, **kwargs)
    plan_lo = to_device_tiles(t_lo, dtype=np.float32, **kwargs)
    if isinstance(plan_hi, ClassedTiles):
        lo = tuple(p.vals for p in plan_lo.plans)
    else:
        lo = (plan_lo.vals,)
    return DfMergeTiles(
        plan_hi, lo,
        jnp.asarray(tiles.ovf_rows.astype(np.int32)),
        jnp.asarray(tiles.ovf_cols.astype(np.int32)),
        jnp.asarray(ovf64),
    )


def _df_neg(h, l):
    return -h, -l


def _df_scan(Ph, Pl, interpret: bool):
    """Inclusive prefix sum of double-float pairs in slot order
    (slot p -> sublane p // 128, lane p % 128; tiles stacked down
    sublanes at stride 8): 7 Hillis-Steele lane steps + a tile-local
    3-step sublane carry, every addition a compensated two-sum."""
    roll = jnp.roll if interpret else _tpu_roll
    li = _lane_iota(Ph.shape)
    s = 1
    while s < LANES:
        sh = roll(Ph, s, 1)
        sl = roll(Pl, s, 1)
        m = li >= s
        Ph, Pl = _df_add(Ph, Pl, jnp.where(m, sh, 0.0),
                         jnp.where(m, sl, 0.0))
        s *= 2
    # per-slot-row totals (lane 127), broadcast across lanes
    th = jnp.broadcast_to(
        jax.lax.slice(Ph, (0, LANES - 1), Ph.shape), Ph.shape
    )
    tl = jnp.broadcast_to(
        jax.lax.slice(Pl, (0, LANES - 1), Pl.shape), Pl.shape
    )
    # exclusive prefix of the totals down sublanes, stopping at tile
    # boundaries (within-tile sublane index si = sublane % 8)
    si = _sublane_iota(Ph.shape) % SUBLANES
    ch = roll(th, 1, 0)
    cl = roll(tl, 1, 0)
    m1 = si >= 1
    ch = jnp.where(m1, ch, 0.0)
    cl = jnp.where(m1, cl, 0.0)
    s = 1
    while s < SUBLANES:
        sh = roll(ch, s, 0)
        sl = roll(cl, s, 0)
        m = si >= s  # source r-s stays within the tile iff si >= s
        ch, cl = _df_add(ch, cl, jnp.where(m, sh, 0.0),
                         jnp.where(m, sl, 0.0))
        s *= 2
    return _df_add(Ph, Pl, ch, cl)


def _tpu_roll(x, s, axis):
    from jax.experimental.pallas import tpu as pltpu_

    return pltpu_.roll(x, s, axis=axis)


def _df_row_diff(Gh, Gl):
    """partial[w] = G[w] df- G[w-1] in row-major (WrB, 128) order —
    the double-float counterpart of merge_spmv._row_diff."""
    li = _lane_iota(Gh.shape)
    r1h = jnp.roll(Gh, 1, axis=1)
    r1l = jnp.roll(Gl, 1, axis=1)
    if Gh.shape[0] == 1:
        ph = jnp.where(li >= 1, r1h, 0.0)
        pl_ = jnp.where(li >= 1, r1l, 0.0)
    else:
        si = _sublane_iota(Gh.shape)
        r2h = jnp.roll(r1h, 1, axis=0)
        r2l = jnp.roll(r1l, 1, axis=0)
        ph = jnp.where(li >= 1, r1h, jnp.where(si >= 1, r2h, 0.0))
        pl_ = jnp.where(li >= 1, r1l, jnp.where(si >= 1, r2l, 0.0))
    return _df_add(Gh, Gl, *_df_neg(ph, pl_))


@kernel_no_x64
def _fused_kernel_df(gather_rows: int, rspan: int, tps: int,
                     use_blk: bool, interpret: bool,
                     rblk_ref, cblk_ref, cspan_ref,
                     vh_ref, vl_ref, lc_ref, ep_ref, xh_ref, xl_ref,
                     yh_ref, yl_ref):
    """df grid step: the merge_spmv._fused_kernel pipeline with Dekker
    products, the compensated register scan, dual-plane extraction,
    and double-float y accumulation. ``use_blk``: cblk_ref is the
    per-tile block list (see merge_spmv._gather_blocks)."""
    from tpusparse.kernels.merge_spmv import _gather_blocks

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        yh_ref[:] = jnp.zeros_like(yh_ref)
        yl_ref[:] = jnp.zeros_like(yl_ref)

    phs, pls = [], []
    for u in range(tps):
        t = step * tps + u
        lc = lc_ref[u].astype(jnp.int32)
        if use_blk:
            gh = _gather_blocks(xh_ref, cblk_ref, t, lc, gather_rows)
            gl = _gather_blocks(xl_ref, cblk_ref, t, lc, gather_rows)
        else:
            gh = _gather_window(xh_ref, cblk_ref[t], lc, gather_rows)
            gl = _gather_window(xl_ref, cblk_ref[t], lc, gather_rows)
        vh = vh_ref[u]
        vl = vl_ref[u]
        # (vh+vl)(gh+gl): Dekker two-product + first-order cross terms
        p, e = _two_prod(vh, gh)
        e = e + (vh * gl + vl * gh)
        hi = p + e
        lo = e - (hi - p)
        phs.append(hi)
        pls.append(lo)
    csh, csl = _df_scan(jnp.concatenate(phs, axis=0),
                        jnp.concatenate(pls, axis=0), interpret)

    for u in range(tps):
        t = step * tps + u
        ch = csh[u * SUBLANES : (u + 1) * SUBLANES]
        cl = csl[u * SUBLANES : (u + 1) * SUBLANES]
        Gh = _extract_rows(ch, ep_ref[u])
        Gl = _extract_rows(cl, ep_ref[u])
        part_h, part_l = _df_row_diff(Gh, Gl)
        rb = rblk_ref[t]
        ah, al = _df_add(yh_ref[pl.ds(rb, rspan), :],
                         yl_ref[pl.ds(rb, rspan), :], part_h, part_l)
        yh_ref[pl.ds(rb, rspan), :] = ah
        yl_ref[pl.ds(rb, rspan), :] = al


@functools.partial(jax.jit, static_argnames=("nrows_out",))
@kernel_no_x64
def _spmv_tiles_df(A: DeviceTiles, vlo, xh2d, xl2d, nrows_out: int):
    ntiles = A.ntiles
    tps = A.tiles_per_step
    steps = ntiles // tps
    rspan = A.row_span
    csize = TILE_NNZ // SUBLANES
    mb = nrows_out // LANES

    use_blk = A.blk_list is not None
    resident = 2 * (xh2d.size * 4 + mb * LANES * 4)
    return pl.pallas_call(
        functools.partial(_fused_kernel_df, A.gather_rows, rspan, tps,
                          use_blk, _interpret()),
        compiler_params=_vmem_params(
            resident, tps, 2 * rspan,
            # +4: the lo value plane rides along each step's payload
            idx_bytes=np.dtype(A.local_cols.dtype).itemsize + 4),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((tps, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((tps, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((tps, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((tps, rspan, LANES),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec(xh2d.shape, lambda i, rb, cb, cs: (0, 0)),
                pl.BlockSpec(xl2d.shape, lambda i, rb, cb, cs: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((mb, LANES), lambda i, rb, cb, cs: (0, 0)),
                pl.BlockSpec((mb, LANES), lambda i, rb, cb, cs: (0, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mb, LANES), jnp.float32),
            jax.ShapeDtypeStruct((mb, LANES), jnp.float32),
        ),
        interpret=_interpret(),
    )(A.row_block, A.blk_list if use_blk else A.col_block, A.col_span,
      A.vals, vlo, A.local_cols, A.end_pos, xh2d, xl2d)


def _spmv_one_plan(A: DeviceTiles, vlo, xh2d, xl2d):
    mb = -(-A.num_rows // LANES) + A.y_pad_rows
    yh2d, yl2d = _spmv_tiles_df(A, vlo, xh2d, xl2d, mb * LANES)
    return (yh2d.reshape(-1)[: A.num_rows].astype(jnp.float64)
            + yl2d.reshape(-1)[: A.num_rows].astype(jnp.float64))


def spmv_merge_df(A: DfMergeTiles, x, alpha=1.0, beta=0.0, y=None):
    """y = alpha * A @ x + beta * y at double-float accuracy; x and y
    are fp64 arrays (splits/recombines outside the kernel)."""
    x = x.astype(jnp.float64)
    xh = x.astype(jnp.float32)
    xl = (x - xh.astype(jnp.float64)).astype(jnp.float32)
    plans = (A.hi.plans if isinstance(A.hi, ClassedTiles)
             else (A.hi,))
    y_new = None
    for p, vlo in zip(plans, A.lo):
        xh2d = _pad_x(p, xh)
        xl2d = _pad_x(p, xl)
        part = _spmv_one_plan(p, vlo, xh2d, xl2d)
        y_new = part if y_new is None else y_new + part
    if A.ovf_vals.shape[0] > 0:
        from tpusparse.ops.reference import spmv_coo

        y_new = y_new + spmv_coo(A.ovf_rows, A.ovf_cols,
                                 A.ovf_vals, x, A.num_rows)
    if beta == 0.0 or y is None:
        return alpha * y_new if alpha != 1.0 else y_new
    return alpha * y_new + beta * y


def spmm_merge_df(A: DfMergeTiles, X, alpha=1.0, beta=0.0, Y=None):
    """Column-at-a-time fallback — plan_matrix routes fp64 multi-RHS
    workloads (L >= 2) to the df-ELL kernel, which fills its (L, 128)
    registers; this keeps spmm() total on the operand type."""
    cols = [spmv_merge_df(A, X[:, j]) for j in range(X.shape[1])]
    Y_new = jnp.stack(cols, axis=1)
    if beta == 0.0 or Y is None:
        return alpha * Y_new if alpha != 1.0 else Y_new
    return alpha * Y_new + beta * Y
