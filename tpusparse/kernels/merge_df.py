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

Multi-RHS (``_spmm_kernel_df``): the spmm_merge pipeline with df
arithmetic — the tile payload streams once, one (L, 128) hardware
gather per slot row and plane serves all L RHS lanes, and the MXU
triangular scan (which accumulates in f32 and cannot carry Dekker
compensation) is replaced by the same Hillis-Steele df lane scan +
sequential df inter-row carries. This is the fp64 multi-RHS path for
skewed/scattered matrices where the df-ELL kernel's job count
explodes (rmat-14: 0.33 GF).

Accuracy semantics: ~1e-14 relative with f32 exponent range (NOT
strict IEEE fp64), like every df kernel here; prefix-difference
cancellation adds |prefix|/|row_sum| amplification on top, bounded in
practice by the tile's 1024-slot window.

Reference capability: fp64 default mode of the SpMV/SpMM drivers
(``cpu_spmv.cpp:750-923``, ``cpu_spmm_v2.cpp:901-1115``) over the
merge strategy (``merge-based CsrMV,
cub/agent/agent_spmv_orig.cuh:289-406``; ``OmpMergeCsrmm,
work_2025/spmm/merge_based.hpp:49-153``).
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


TILES_PER_STEP_SPMM_DF = 8  # divides every per-matrix pad multiple


def _spmm_df_tps() -> int:
    # XLA-CPU (interpret-mode) compile time explodes with the big
    # unrolled df body (see CLAUDE.md / DF_JOBS_PER_TILE); 2 tiles per
    # step keeps test compiles tractable and divides the pad multiple
    return TILES_PER_STEP_SPMM_DF if not _interpret() else 2


@kernel_no_x64
def _spmm_kernel_df(gather_rows: int, rspan: int, L: int, T: int,
                    use_blk: bool, interpret: bool,
                    rblk_ref, cblk_ref, cspan_ref,
                    vh_ref, vl_ref, lc_ref, ep_ref,
                    xh_ref, xl_ref, yh_ref, yl_ref):
    """df multi-RHS grid step: the spmm_merge._spmm_kernel pipeline
    with Dekker products, a Hillis-Steele df lane scan (the MXU
    triangular scan accumulates in f32 and cannot carry Dekker
    compensation), df inter-row carries, dual-plane extraction, and
    double-float y accumulation. One (L, 128) hardware gather per
    slot row and plane serves all L RHS lanes."""
    roll = jnp.roll if interpret else _tpu_roll
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        yh_ref[:] = jnp.zeros_like(yh_ref)
        yl_ref[:] = jnp.zeros_like(yl_ref)

    from tpusparse.kernels._util import tala32

    li = _lane_iota((L, LANES))
    for u in range(T):
        t = step * T + u
        if use_blk:
            winh = [xh_ref[pl.ds(cblk_ref[t, qq], 1)][0]
                    for qq in range(gather_rows)]
            winl = [xl_ref[pl.ds(cblk_ref[t, qq], 1)][0]
                    for qq in range(gather_rows)]
        else:
            wh = xh_ref[pl.ds(cblk_ref[t], gather_rows)]
            wl = xl_ref[pl.ds(cblk_ref[t], gather_rows)]
            winh = [wh[qq] for qq in range(gather_rows)]
            winl = [wl[qq] for qq in range(gather_rows)]
        prows_h, prows_l = [], []
        for i in range(SUBLANES):
            lc_i = lc_ref[u, i : i + 1, :].astype(jnp.int32)  # (1, 128)
            b = jnp.broadcast_to(lc_i % LANES, (L, LANES))
            q = jnp.broadcast_to(lc_i // LANES, (L, LANES))
            gh = jnp.zeros((L, LANES), jnp.float32)
            gl = jnp.zeros((L, LANES), jnp.float32)
            for qq in range(gather_rows):
                gh = jnp.where(q == qq, tala32(winh[qq], b, axis=1), gh)
                gl = jnp.where(q == qq, tala32(winl[qq], b, axis=1), gl)
            vh = jnp.broadcast_to(vh_ref[u, i : i + 1, :], (L, LANES))
            vl = jnp.broadcast_to(vl_ref[u, i : i + 1, :], (L, LANES))
            # (vh+vl)(gh+gl): Dekker two-product + first-order cross
            p, e = _two_prod(vh, gh)
            e = e + (vh * gl + vl * gh)
            hi = p + e
            prows_h.append(hi)
            prows_l.append(e - (hi - p))
        # inclusive lane prefix of all 8 slot rows at once: 7
        # Hillis-Steele df steps on the stacked (8L, 128) register set
        Ph = jnp.concatenate(prows_h, axis=0)
        Pl = jnp.concatenate(prows_l, axis=0)
        li8 = _lane_iota(Ph.shape)
        s = 1
        while s < LANES:
            sh = roll(Ph, s, 1)
            sl = roll(Pl, s, 1)
            m = li8 >= s
            Ph, Pl = _df_add(Ph, Pl, jnp.where(m, sh, 0.0),
                             jnp.where(m, sl, 0.0))
            s *= 2
        # sequential inter-row carry (df): rows chain within the tile
        cs_h, cs_l = [], []
        ch = jnp.zeros((L, 1), jnp.float32)
        cl = jnp.zeros((L, 1), jnp.float32)
        for i in range(SUBLANES):
            ph, pl_ = _df_add(Ph[i * L : (i + 1) * L],
                              Pl[i * L : (i + 1) * L],
                              jnp.broadcast_to(ch, (L, LANES)),
                              jnp.broadcast_to(cl, (L, LANES)))
            ch = ph[:, LANES - 1 :]
            cl = pl_[:, LANES - 1 :]
            cs_h.append(ph)
            cs_l.append(pl_)

        # dual-plane extraction at the (lane-shared) end positions
        prev_h = jnp.zeros((L, 1), jnp.float32)
        prev_l = jnp.zeros((L, 1), jnp.float32)
        parts_h, parts_l = [], []
        for w in range(rspan):
            ep = ep_ref[u, w : w + 1, :].astype(jnp.int32)    # (1, 128)
            epc = jnp.maximum(ep, 0)
            g_e = jnp.broadcast_to(epc // LANES, (L, LANES))
            j_e = jnp.broadcast_to(epc % LANES, (L, LANES))
            Gh = jnp.zeros((L, LANES), jnp.float32)
            Gl = jnp.zeros((L, LANES), jnp.float32)
            for i in range(SUBLANES):
                Gh = jnp.where(g_e == i, tala32(cs_h[i], j_e, axis=1),
                               Gh)
                Gl = jnp.where(g_e == i, tala32(cs_l[i], j_e, axis=1),
                               Gl)
            sentinel = jnp.broadcast_to(ep, (L, LANES)) < 0
            Gh = jnp.where(sentinel, 0.0, Gh)
            Gl = jnp.where(sentinel, 0.0, Gl)
            Gph = jnp.where(li >= 1, jnp.roll(Gh, 1, axis=1),
                            jnp.broadcast_to(prev_h, (L, LANES)))
            Gpl = jnp.where(li >= 1, jnp.roll(Gl, 1, axis=1),
                            jnp.broadcast_to(prev_l, (L, LANES)))
            dh, dl = _df_add(Gh, Gl, *_df_neg(Gph, Gpl))
            parts_h.append(dh)
            parts_l.append(dl)
            prev_h = Gh[:, LANES - 1 :]
            prev_l = Gl[:, LANES - 1 :]
        part_h = (jnp.stack(parts_h, axis=0) if rspan > 1
                  else parts_h[0][None])              # (rspan, L, 128)
        part_l = (jnp.stack(parts_l, axis=0) if rspan > 1
                  else parts_l[0][None])
        rb = rblk_ref[t]
        ah, al = _df_add(yh_ref[pl.ds(rb, rspan)],
                         yl_ref[pl.ds(rb, rspan)], part_h, part_l)
        yh_ref[pl.ds(rb, rspan)] = ah
        yl_ref[pl.ds(rb, rspan)] = al


@functools.partial(jax.jit, static_argnames=("mb", "T"))
@kernel_no_x64
def _spmm_tiles_df(A: DeviceTiles, vlo, xh3, xl3, mb: int, T: int):
    """xh3/xl3: (Ncb, L, 128) hi/lo RHS planes; returns two
    (mb, L, 128) f32 output planes."""
    L = xh3.shape[1]
    steps = A.ntiles // T
    rspan = A.row_span
    csize = TILE_NNZ // SUBLANES

    use_blk = A.blk_list is not None
    resident = 2 * (xh3.size + mb * L * LANES) * 4
    outs = pl.pallas_call(
        functools.partial(_spmm_kernel_df, A.gather_rows, rspan, L, T,
                          use_blk, _interpret()),
        compiler_params=_vmem_params(
            resident, T, 2 * rspan,
            # +4: the lo value plane rides along each step's payload
            idx_bytes=np.dtype(A.local_cols.dtype).itemsize + 4),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((T, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((T, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((T, SUBLANES, csize),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec((T, rspan, LANES),
                             lambda i, rb, cb, cs: (i, 0, 0)),
                pl.BlockSpec(xh3.shape, lambda i, rb, cb, cs: (0, 0, 0)),
                pl.BlockSpec(xl3.shape, lambda i, rb, cb, cs: (0, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((mb, L, LANES),
                             lambda i, rb, cb, cs: (0, 0, 0)),
                pl.BlockSpec((mb, L, LANES),
                             lambda i, rb, cb, cs: (0, 0, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((mb, L, LANES), jnp.float32),
            jax.ShapeDtypeStruct((mb, L, LANES), jnp.float32),
        ),
        interpret=_interpret(),
    )(A.row_block, A.blk_list if use_blk else A.col_block, A.col_span,
      A.vals, vlo, A.local_cols, A.end_pos, xh3, xl3)
    return outs


def _spmm_one_plan(A: DeviceTiles, vlo, Xh, Xl):
    """Per-plan df SpMM over lane chunks; Xh/Xl (num_cols, Lp) f32,
    returns (num_rows, Lp) f64."""
    from tpusparse.kernels.ell_spmm import X_VMEM_BUDGET_BYTES
    from tpusparse.kernels.spmm_merge import _to_x3

    Lp = Xh.shape[1]
    ncb = -(-A.num_cols // LANES) + A.x_pad_rows
    mb = -(-A.num_rows // LANES) + A.y_pad_rows
    # hi+lo planes for both the RHS block and the output block
    per_lane = 2 * (ncb + mb) * LANES * 4
    max_lanes = max((X_VMEM_BUDGET_BYTES // per_lane) // 8 * 8, 8)
    outs = []
    for s in range(0, Lp, max_lanes):
        xh3 = _to_x3(A, Xh[:, s : s + max_lanes])
        xl3 = _to_x3(A, Xl[:, s : s + max_lanes])
        Lc = xh3.shape[1]
        yh3, yl3 = _spmm_tiles_df(A, vlo, xh3, xl3, mb,
                                  _spmm_df_tps())
        y2 = (jnp.transpose(yh3, (0, 2, 1)).reshape(-1, Lc)
              .astype(jnp.float64)
              + jnp.transpose(yl3, (0, 2, 1)).reshape(-1, Lc)
              .astype(jnp.float64))
        outs.append(y2[: A.num_rows])
    Y = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return Y


def spmm_merge_df(A: DfMergeTiles, X, alpha=1.0, beta=0.0, Y=None):
    """Y = alpha * A @ X + beta * Y at double-float accuracy via the
    in-kernel multi-RHS df merge pipeline (X of shape (num_cols, L),
    fp64). Skew-insensitive like the f32 flagship — the df-ELL kernel's
    job count explodes on power-law rows (R-MAT: 0.33 GF) while this
    kernel rides the same merge tiles as the SpMV path."""
    if X.ndim == 1:
        y = spmv_merge_df(A, X, alpha=alpha,
                          beta=beta, y=Y)
        return y
    X = X.astype(jnp.float64)
    Xh = X.astype(jnp.float32)
    Xl = (X - Xh.astype(jnp.float64)).astype(jnp.float32)
    L = X.shape[1]
    Lp = max(-(-L // 8) * 8, 8)   # Mosaic sublane tile constraint
    if Lp != L:
        pad = jnp.zeros((X.shape[0], Lp - L), jnp.float32)
        Xh = jnp.concatenate([Xh, pad], axis=1)
        Xl = jnp.concatenate([Xl, pad], axis=1)
    plans = (A.hi.plans if isinstance(A.hi, ClassedTiles)
             else (A.hi,))
    Y_new = None
    for p, vlo in zip(plans, A.lo):
        part = _spmm_one_plan(p, vlo, Xh, Xl)
        Y_new = part if Y_new is None else Y_new + part
    Y_new = Y_new[:, :L]
    if A.ovf_vals.shape[0] > 0:
        from tpusparse.ops.reference import spmm_coo

        Y_new = Y_new + spmm_coo(A.ovf_rows, A.ovf_cols, A.ovf_vals,
                                 X, A.num_rows)
    if beta == 0.0 or Y is None:
        return alpha * Y_new if alpha != 1.0 else Y_new
    return alpha * Y_new + beta * Y
