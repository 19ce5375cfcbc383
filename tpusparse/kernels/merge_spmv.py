"""Pallas merge-tile SpMV — the flagship TPU kernel.

TPU re-design of the SC'16 merge-based CSR SpMV (reference CUDA pipeline:
``DeviceSpmvSearchKernel`` -> ``DeviceSpmvKernel`` ->
``DeviceSegmentFixupKernel``, ``cub/device/dispatch/dispatch_spmv_orig.cuh:
104,158,199``; per-CTA state machine ``AgentSpmv::ConsumeTile``,
``cub/agent/agent_spmv_orig.cuh:289-406``). The GPU version binary-searches
merge-path coordinates at run time, stages tiles in shared memory, does a
block-wide reduce-by-key scan, and fixes up inter-block carries with a
third kernel. The TPU version restructures all of this around static
shapes and the VPU/MXU register model:

  1. The merge-path *search* happens on host at matrix-load time
     (:func:`tpusparse.formats.tiles.build_merge_tiles`) — equal-nnz
     tiles with 128-aligned row/column windows.
  2. The *gather* of x becomes a bounded select-loop of intra-register
     lane gathers (``take_along_axis`` on (8,128) tiles — the only
     dynamic-gather shape the hardware supports) over the tile's column
     window, read from a VMEM-resident x.
  3. The *reduce-by-key scan* becomes an unsegmented register prefix-sum
     (3 sublane steps + 7 lane steps) followed by a gather at
     host-precomputed per-row end positions; row sums are differences of
     the prefix sum at consecutive end positions — empty rows and
     padding fall out automatically.
  4. The *segment fixup* collapses into a second tiny kernel that
     accumulates per-tile partial windows into y; TPU grid execution is
     sequential on a core, so read-modify-write accumulation needs no
     atomics or decoupled lookback at all.

Constraints of this kernel (handled by ops.spmv / ops.chunked):
  * tile_nnz == 1024 (an (8, 128) register tile), fp32 values;
  * x and y resident in VMEM. The call requests the scoped-vmem it
    needs (``_vmem_params``, ~100 MB ceiling of the v5e's 128 MB),
    which admits ~8M rows/cols in one call; larger matrices run as a
    block grid of these calls (tpusparse.ops.chunked).
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

from tpusparse.kernels._util import kernel_no_x64, tala32
from tpusparse.formats.tiles import MergeTiles, LANES, SUBLANES

TILE_NNZ = 1024  # (8, 128) register tile
TILES_PER_STEP = 16  # default tiles per grid step; actual value is
                     # chosen per matrix (see _choose_tiles_per_step)
                     # and carried statically on the DeviceTiles plan


def _choose_tiles_per_step(ntiles: int) -> int:
    """Per-matrix step batch: bigger steps amortize per-step overhead
    (32 measured fastest with the chunked MXU scan on lap3d-48; 64 was
    not reliably better), bounded so grid padding stays <= ~12.5% of
    the tile count."""
    for tps in (32, 16):
        if ntiles >= 8 * tps:
            return tps
    return 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceTiles:
    """Device-resident MergeTiles plus overflow stream."""

    num_rows: int
    num_cols: int
    nnz: int
    row_window: int
    col_window: int

    vals: Any        # (ntiles_pad, 8, 128) — slot p -> [t, p//128, p%128]
    local_cols: Any  # (ntiles_pad, 8, 128) int16 (int32 if Wc > 32767)
    end_pos: Any     # (ntiles_pad, row_span, 128) int16 — ROW-ANCHORED:
                     # slice w covers output rows row_block*128 + w*128
                     # ..+127; -1 sentinel only as a leading prefix,
                     # trailing pad slices edge-replicate the final
                     # value (zero row-diffs)
    row_block: Any   # (ntiles_pad,) int32 — includes the per-tile row
                     # anchor (first touched 128-row slice)
    col_block: Any   # (ntiles_pad,) int32
    col_span: Any    # (ntiles_pad,) int32 — per-tile touched window rows
    gather_rows: int # static gather loop trip count = max(col_span);
                     # tight per-tile anchoring makes this 2-5 for banded
                     # matrices vs col_window/128 for the naive anchor
    x_pad_rows: int  # row padding of the x 2-D layout (static)
    tiles_per_step: int  # grid-step tile batch (static, per matrix)
    row_span: int    # static extraction trip count = max touched
                     # 128-row output slices over tiles (<= Wr/128; the
                     # row analogue of gather_rows — extraction and the
                     # y read-modify-write scale with real row span, not
                     # the worst-case window)
    y_pad_rows: int  # extra y 2-D rows beyond ceil(num_rows/128) so the
                     # last tiles' (row_span, 128) windows stay in bounds

    ovf_rows: Any
    ovf_cols: Any
    ovf_vals: Any

    # Block-list plans (formats.tiles.build_block_tiles): (ntiles_pad,
    # gather_rows) int32 scalar-prefetch table of the 128-wide x blocks
    # each tile touches; the kernel gathers x_ref[blk_list[t, qq]]
    # instead of a contiguous window below col_block. None for
    # contiguous-window plans.
    blk_list: Any = None

    # Which PARTITION family produced these tiles: "merge" (clustered
    # classic/greedy) or "nonzero_split" (pure equal-nnz cuts). The
    # families share this device type and kernels; the tag keeps
    # ``ops.spmv.plan_kind`` the single source of truth for strategy
    # row labels (ADVICE r4) — without it nonzero_split rows printed
    # as "merge" for enum callers and the real-matrix battery.
    family: str = "merge"

    def tree_flatten(self):
        return (
            (self.vals, self.local_cols, self.end_pos, self.row_block,
             self.col_block, self.col_span,
             self.ovf_rows, self.ovf_cols, self.ovf_vals,
             self.blk_list),
            (self.num_rows, self.num_cols, self.nnz, self.row_window,
             self.col_window, self.gather_rows, self.x_pad_rows,
             self.tiles_per_step, self.row_span, self.y_pad_rows,
             self.family),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        (vals, lcols, epos, rblk, cblk, cspan, orow, ocol, oval,
         blk) = children
        (nr, nc, nnz, wr, wc, gr, xpr, tps, rs, ypr, fam) = aux
        return cls(nr, nc, nnz, wr, wc, vals, lcols, epos, rblk, cblk,
                   cspan, gr, xpr, tps, rs, ypr, orow, ocol, oval, blk,
                   fam)

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def dtype(self):
        return self.vals.dtype


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ClassedTiles:
    """Span-classed merge plan: one DeviceTiles per row-span bucket.

    A single static ``row_span`` is hostage to the widest tile: e.g. a
    3-D Laplacian's far-diagonal bands make tiles with one nonzero per
    row spanning the whole row window, forcing every dense-band tile
    (real span 2-3) through worst-case extraction, write width, and
    gather loops. Splitting tiles into a few span buckets — one
    ``pallas_call`` each, each with its own static ``row_span``,
    ``gather_rows``, and step batch — restores per-tile-proportional
    cost. Accumulation into y is order-independent (pure +=), so
    summing the per-class outputs is exact; the TPU analogue of the
    reference's per-arch kernel policy selection
    (dispatch_spmv_orig.cuh:266-424) applied per tile class."""

    plans: Any  # tuple[DeviceTiles, ...]; plans[0] carries the
                # overflow stream, the others hold empty streams

    def tree_flatten(self):
        return ((self.plans,), ())

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def num_rows(self):
        return self.plans[0].num_rows

    @property
    def num_cols(self):
        return self.plans[0].num_cols

    @property
    def nnz(self):
        return sum(p.nnz for p in self.plans)

    @property
    def dtype(self):
        return self.plans[0].dtype

    @property
    def ntiles(self):
        return sum(p.ntiles for p in self.plans)

    @property
    def family(self):
        return self.plans[0].family


def _tile_row_anchors(tiles: MergeTiles):
    """Per-tile tight row anchor (128-row slices below the window base)
    and touched-slice span, derived from the host end-position table."""
    ep_host = np.asarray(tiles.end_pos)               # (nt, Wr)
    ne = ep_host >= 0
    rmin = np.argmax(ne, axis=1)                      # first touched row
    final = ep_host[:, -1:]
    rmax = np.argmax(ep_host == final, axis=1)        # last touched row
    anchor = np.where(ne.any(axis=1), rmin // LANES, 0)
    span = np.maximum(rmax // LANES - anchor + 1, 1)
    return anchor.astype(np.int64), span.astype(np.int64)


def _subset_device_tiles(tiles: MergeTiles, sel, anchor, span, dtype,
                         tiles_per_step, with_ovf: bool,
                         family: str = "merge") -> DeviceTiles:
    """Build a DeviceTiles from the tile subset ``sel`` (None = all)."""
    vals_h = np.asarray(tiles.vals)
    lcols_h = np.asarray(tiles.local_cols)
    ep_h = np.asarray(tiles.end_pos)
    rblk_h = np.asarray(tiles.row_block)
    cblk_h = np.asarray(tiles.col_block)
    cspan_h = np.asarray(tiles.col_span)
    blk_h = (np.asarray(tiles.blk_list)
             if tiles.blk_list is not None else None)
    nnz_sel = tiles.nnz
    if sel is not None:
        vals_h, lcols_h, ep_h = vals_h[sel], lcols_h[sel], ep_h[sel]
        rblk_h, cblk_h, cspan_h = rblk_h[sel], cblk_h[sel], cspan_h[sel]
        anchor, span = anchor[sel], span[sel]
        if blk_h is not None:
            blk_h = blk_h[sel]
        nnz_sel = int(np.count_nonzero(vals_h))  # informational
    nt = vals_h.shape[0]
    tps = tiles_per_step or _choose_tiles_per_step(nt)
    ntp = -(-nt // tps) * tps

    # slot p -> (p // 128, p % 128): C-order reshape of the (T,) stream.
    # Index payloads ship as int16 (halved HBM/VMEM traffic) and upcast
    # in-register: local cols < col_window <= 32767 for every tuner
    # choice, end positions < tile_nnz = 1024.
    itype = np.int16 if tiles.col_window <= 32767 else np.int32
    vals = np.zeros((ntp, SUBLANES, TILE_NNZ // SUBLANES), dtype=dtype)
    lcols = np.zeros((ntp, SUBLANES, TILE_NNZ // SUBLANES), dtype=itype)
    vals[:nt] = vals_h.astype(dtype).reshape(
        nt, SUBLANES, TILE_NNZ // SUBLANES
    )
    lcols[:nt] = lcols_h.reshape(nt, SUBLANES, TILE_NNZ // SUBLANES)

    # ROW-ANCHORED end positions: extraction and the y read-modify-
    # write run max-row-span iterations instead of Wr/128 (the row
    # analogue of the tight column anchor). The anchor folds into
    # row_block; trailing slices edge-replicate the final end position
    # (duplicate extraction values -> zero row-diffs -> harmless
    # accumulates), so clipping at the window edge is safe.
    RS = int(span.max()) if nt else 1
    idx = anchor[:, None] * LANES + np.arange(RS * LANES)[None, :]
    idx = np.minimum(idx, tiles.row_window - 1)
    epos = np.full((ntp, RS, LANES), -1, dtype=np.int16)
    epos[:nt] = np.take_along_axis(ep_h, idx, axis=1).reshape(
        nt, RS, LANES
    )
    rblk = np.zeros(ntp, dtype=np.int32)
    cblk = np.zeros(ntp, dtype=np.int32)
    cspan = np.zeros(ntp, dtype=np.int32)  # pad tiles: 0-trip gather
    rblk[:nt] = rblk_h + anchor.astype(np.int32)
    cblk[:nt] = cblk_h
    cspan[:nt] = cspan_h
    nrb = -(-tiles.num_rows // LANES)
    y_pad = max(int(rblk.max()) + RS - nrb, 1) if nt else 1

    blk_dev = None
    gr = int(max(cspan_h.max(), 1)) if nt else 1
    if blk_h is not None:
        # trim the list width to this subset's max span; pad tiles /
        # pad columns point at block 0 (their lc never select it)
        blk_p = np.zeros((ntp, gr), dtype=np.int32)
        blk_p[:nt] = blk_h[:, :gr]
        blk_dev = jnp.asarray(blk_p)

    empty_i = np.zeros(0, dtype=np.int32)
    return DeviceTiles(
        num_rows=tiles.num_rows,
        num_cols=tiles.num_cols,
        nnz=nnz_sel,
        row_window=tiles.row_window,
        col_window=tiles.col_window,
        vals=jnp.asarray(vals),
        local_cols=jnp.asarray(lcols),
        end_pos=jnp.asarray(epos),
        row_block=jnp.asarray(rblk),
        col_block=jnp.asarray(cblk),
        col_span=jnp.asarray(cspan),
        gather_rows=gr,
        # block-list gathers read exact (1, 128) x rows — no window
        # overhang pad needed
        x_pad_rows=0 if blk_h is not None else tiles.col_window // LANES,
        tiles_per_step=tps,
        row_span=RS,
        y_pad_rows=y_pad,
        ovf_rows=jnp.asarray(
            tiles.ovf_rows.astype(np.int32) if with_ovf else empty_i),
        ovf_cols=jnp.asarray(
            tiles.ovf_cols.astype(np.int32) if with_ovf else empty_i),
        ovf_vals=jnp.asarray(
            tiles.ovf_vals.astype(dtype) if with_ovf
            else np.zeros(0, dtype=dtype)),
        blk_list=blk_dev,
        family=family,
    )


# Buckets smaller than this fold into the next-wider one: a class
# whose kernel cannot fill a few grid steps pays more in dispatch +
# grid padding than its narrower static span saves.
MIN_CLASS_TILES = 64


def to_device_tiles(tiles: MergeTiles, dtype=np.float32,
                    tiles_per_step: int | None = None,
                    span_classes: int = 3, family: str = "merge"):
    """Upload a host MergeTiles partition, reshaping tile payloads into
    the kernel's (8, 128) ROW-major register layout (slot p ->
    [t, p // 128, p % 128]) and padding the tile count to a multiple of
    the per-matrix step batch (kept a multiple of 8 so the SpMM
    kernel's smaller batch always divides it).

    Row-major puts 128 consecutive slots on one sublane row, which lets
    the multi-RHS SpMM kernel (kernels/spmm_merge.py) gather x for all
    L RHS lanes with ONE hardware lane-gather per slot row — the same
    trick the ELL kernel uses.

    Returns a single :class:`DeviceTiles`, or a :class:`ClassedTiles`
    of up to ``span_classes`` plans when the tiles' row spans are
    heterogeneous enough that per-class static spans pay for the extra
    dispatches (``span_classes=1`` forces a single plan — used by the
    sharded path, which needs uniform shapes across shards)."""
    if tiles.tile_nnz != TILE_NNZ:
        raise ValueError(f"kernel requires tile_nnz={TILE_NNZ}")
    if tiles_per_step is not None and tiles_per_step % 8 != 0:
        # the SpMM kernel batches 8 tiles/step and computes its step
        # count as ntiles // 8 — a pad multiple not divisible by 8
        # would silently drop the remainder tiles there
        raise ValueError("tiles_per_step must be a multiple of 8")
    anchor, span = _tile_row_anchors(tiles)
    nt = tiles.ntiles
    if span_classes <= 1 or nt < 2 * MIN_CLASS_TILES:
        return _subset_device_tiles(tiles, None, anchor, span, dtype,
                                    tiles_per_step, with_ovf=True,
                                    family=family)
    # pow2 span buckets, small buckets folded upward, capped at
    # span_classes by folding the smallest-population buckets upward.
    # Classic window plans bucket by ROW span (extraction/y-RMW is the
    # span-scaled cost; the gather loop is window-bound either way);
    # block-list plans bucket by COL span — their gather loop runs the
    # class max and their col spans are strongly bimodal (a third of
    # R-MAT tiles are single-block), while row spans hug the window.
    class_key = (np.asarray(tiles.col_span).astype(np.int64)
                 if getattr(tiles, "span_class_by", "row") == "col"
                 else span)
    bucket = np.maximum(
        np.ceil(np.log2(class_key)).astype(np.int64), 0
    )
    uniq = sorted(set(bucket.tolist()))
    for i, b in enumerate(uniq[:-1]):
        if np.count_nonzero(bucket == b) < MIN_CLASS_TILES:
            bucket[bucket == b] = uniq[i + 1]
    uniq = sorted(set(bucket.tolist()))
    while len(uniq) > span_classes:
        counts = [np.count_nonzero(bucket == b) for b in uniq]
        i = int(np.argmin(counts[:-1]))
        bucket[bucket == uniq[i]] = uniq[i + 1]
        uniq = sorted(set(bucket.tolist()))
    if len(uniq) == 1:
        return _subset_device_tiles(tiles, None, anchor, span, dtype,
                                    tiles_per_step, with_ovf=True,
                                    family=family)
    plans = []
    for k, b in enumerate(uniq):
        sel = np.flatnonzero(bucket == b)
        plans.append(_subset_device_tiles(
            tiles, sel, anchor, span, dtype, tiles_per_step,
            with_ovf=(k == 0), family=family))
    return ClassedTiles(tuple(plans))


def _sublane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _prefix_sum_mxu(P, dtype):
    """Inclusive prefix sum in slot order (slot = sublane*128 + lane)
    of a step's tiles stacked down sublanes: P is (8*T, 128) with rows
    u*8+i = slot row i of tile u. Two MXU matmuls do the whole scan —
    the register re-expression of the reference's BlockScan
    reduce-by-key (agent_spmv_orig.cuh:370):

      S     = P @ tri        within-slot-row inclusive prefix
      carry = Tblk @ Stot    per-tile exclusive prefix of row totals
                             (Tblk = blockdiag of 8x8 strict-lower ones)

    The roll-based VPU scan this replaces (7 masked lane shift-adds +
    7-roll broadcast + sublane scan) measured ~6x slower in the SpMM
    kernel's ablation; (128,128) stacking makes the matmuls exactly
    MXU-sized for SpMV too. The carry matmul is chunked at 128 rows so
    its cost stays linear in TILES_PER_STEP (an (R,R) Tblk would grow
    quadratically). HIGHEST precision: default runs one bf16 pass and
    costs ~8 mantissa bits on the prefix sums."""
    R = P.shape[0]
    C = min(R, LANES)
    jj = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    tri = (jj <= kk).astype(dtype)
    jr = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    kr = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    tblk = ((jr // SUBLANES == kr // SUBLANES) & (kr < jr)).astype(dtype)
    dn = (((1,), (0,)), ((), ()))
    hi = SCAN_PRECISION
    out = []
    for c in range(0, R, C):
        S = jax.lax.dot_general(P[c : c + C], tri, dn, precision=hi,
                                preferred_element_type=dtype)
        Stot = jnp.broadcast_to(S[:, LANES - 1 :], (C, LANES))
        carry = jax.lax.dot_general(tblk, Stot, dn, precision=hi,
                                    preferred_element_type=dtype)
        out.append(S + carry)
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def _gather_window(x_ref, cblk, lc, gather_rows):
    """g[i,j] = x[cblk*128 + lc[i,j]] via a static select-loop of lane
    gathers over the tile's column window. Tight per-tile anchoring
    (tiles.py) keeps the static trip count at max(col_span) over the
    matrix — typically 2-5 window rows for banded matrices. (A dynamic
    fori_loop bound measured 3.6x slower: Mosaic's scalar loops defeat
    unrolling/pipelining, so static it is.)"""
    b = lc % LANES
    q = lc // LANES
    win = x_ref[pl.ds(cblk, gather_rows), :]           # one dynamic slice
    g = jnp.zeros(lc.shape, x_ref.dtype)
    for qq in range(gather_rows):
        row = win[qq : qq + 1, :]                      # static (1, 128)
        cand = tala32(
            jnp.broadcast_to(row, lc.shape), b, axis=1
        )
        g = jnp.where(q == qq, cand, g)
    return g


def _select_tree(cands, q):
    """result[i,j] = cands[q[i,j]][i,j] via a binary select tree on
    q's bits: S-1 selects + 2*log2(S) mask ops instead of the
    select-loop's S compares + S selects — a ~10-15% cut of the gather
    stage at spans >= 8 (round-4 A/B; adopted only where measured)."""
    while len(cands) & (len(cands) - 1):
        cands.append(cands[-1])
    level = list(cands)
    bit = 0
    while len(level) > 1:
        m = (q & (1 << bit)) != 0
        level = [jnp.where(m, level[k + 1], level[k])
                 for k in range(0, len(level), 2)]
        bit += 1
    return level[0]


# trace-time switch for the round-4 gather A/B (scripts/r4_merge_tree.py).
# NOT a jit cache key: flipping it after a kernel has compiled keeps
# serving the OLD variant — callers must jax.clear_caches() after
# toggling (r4_merge_tree.py does; ADVICE r4).
GATHER_TREE = False

# MXU pass count for the prefix-sum matmuls (scripts/r4_scan_prec.py
# A/B): HIGHEST = 6 bf16 passes (f32-faithful — the production
# setting; golden ULP checks assume it). The only other option
# Mosaic's in-kernel dot lowering accepts is DEFAULT (one bf16 pass
# — Precision.HIGH raises NotImplementedError); measured 1.44x
# faster on lap3d-48 but err 9.2e-3: the row-DIFFERENCING of prefix
# sums amplifies the bf16 rounding far outside the f32 golden
# contract. Trace-time, like GATHER_TREE.
SCAN_PRECISION = jax.lax.Precision.HIGHEST


def _gather_window_tree(x_ref, cblk, lc, gather_rows):
    b = lc % LANES
    q = lc // LANES
    win = x_ref[pl.ds(cblk, gather_rows), :]
    cands = [
        tala32(jnp.broadcast_to(win[qq:qq + 1, :], lc.shape), b, axis=1)
        for qq in range(gather_rows)
    ]
    return _select_tree(cands, q)


def _gather_blocks_tree(x_ref, blk_ref, t, lc, gather_rows):
    b = lc % LANES
    q = lc // LANES
    cands = [
        tala32(
            jnp.broadcast_to(x_ref[pl.ds(blk_ref[t, qq], 1), :],
                             lc.shape), b, axis=1)
        for qq in range(gather_rows)
    ]
    return _select_tree(cands, q)


def _gather_blocks(x_ref, blk_ref, t, lc, gather_rows):
    """g[i,j] = x[blk_list[t, q]*128 + b] for lc = q*128 + b — the
    block-LIST counterpart of :func:`_gather_window`: each loop
    iteration reads the (1, 128) x row named by the tile's block list
    (one scalar-prefetch lookup + one dynamic slice) instead of a
    static row of one contiguous window. Lets a tile's columns come
    from anywhere in x (formats.tiles.build_block_tiles), which is what
    keeps occupancy high on power-law patterns."""
    b = lc % LANES
    q = lc // LANES
    g = jnp.zeros(lc.shape, x_ref.dtype)
    for qq in range(gather_rows):
        row = x_ref[pl.ds(blk_ref[t, qq], 1), :]
        cand = tala32(jnp.broadcast_to(row, lc.shape), b, axis=1)
        g = jnp.where(q == qq, cand, g)
    return g


def _extract_rows(cs, epos):
    """G[w] = CS[end_pos[w]] (0 where end_pos < 0), with end positions
    in ROW-major slot coordinates: slot p -> (p // 128, p % 128).

    The 2-D gather from the (8, 128) CS table runs as a select-loop
    over CS's 8 sublane rows: broadcast one row, lane-gather with the
    (wrb, 128) end-position lanes, keep where that row is the end
    position's slot row — 8*(bcast+gather+select) ops serving EVERY
    128-row window at once. For narrow row windows (wrb < 6) the
    per-window decomposition (lane gather with a broadcast (1,128)
    index, then a sublane gather) is cheaper at 6*wrb ops and is used
    instead."""
    wrb = epos.shape[0]
    epos = epos.astype(jnp.int32)   # int16 payload -> register upcast
    ep = jnp.maximum(epos, 0)
    i_e = ep // LANES     # sublane (slot row) in [0, 8)
    j_e = ep % LANES      # lane in [0, 128)
    # fast path upper bound: Mosaic's gather operates on ONE (<=8, 128)
    # register tile, so a (wrb, 128)-shaped gather only lowers for
    # wrb <= 8 — wider windows (row_window > 1024 is public API) take
    # the per-window two-shuffle loop below
    if 6 <= wrb <= SUBLANES:
        shape = (wrb, LANES)
        G = jnp.zeros(shape, cs.dtype)
        for i in range(SUBLANES):
            row = jnp.broadcast_to(cs[i : i + 1, :], shape)
            cand = tala32(row, j_e, axis=1)
            G = jnp.where(i_e == i, cand, G)
        return jnp.where(epos < 0, 0.0, G)
    rows = []
    for wb in range(wrb):
        J = jnp.broadcast_to(j_e[wb : wb + 1, :], (SUBLANES, LANES))
        V = tala32(cs, J, axis=1)
        I = jnp.broadcast_to(i_e[wb : wb + 1, :], (SUBLANES, LANES))
        G = tala32(V, I, axis=0)
        rows.append(G[0:1, :])
    G = jnp.concatenate(rows, axis=0) if wrb > 1 else rows[0]
    return jnp.where(epos < 0, 0.0, G)


def _row_diff(G):
    """partial[w] = G[w] - G[w-1] in row-major (WrB, 128) order."""
    li = _lane_iota(G.shape)
    r1 = jnp.roll(G, 1, axis=1)
    if G.shape[0] == 1:
        # single window block: no inter-block wrap to fix up
        return G - jnp.where(li >= 1, r1, 0.0)
    si = _sublane_iota(G.shape)
    r2 = jnp.roll(r1, 1, axis=0)
    Gprev = jnp.where(li >= 1, r1, jnp.where(si >= 1, r2, 0.0))
    return G - Gprev


@kernel_no_x64
def _fused_kernel(gather_rows: int, rspan: int, tps: int, use_blk: bool,
                  rblk_ref, cblk_ref, cspan_ref,
                  vals_ref, lc_ref, ep_ref, x_ref, y_ref):
    """Grid step: TILES_PER_STEP merge tiles -> gather, batched prefix
    sum, per-tile row extraction, and in-VMEM accumulation directly into
    y. The sequential TPU grid makes the read-modify-write safe without
    atomics — the GPU pipeline's segment-fixup kernel
    (dispatch_spmv_orig.cuh:199) disappears entirely.

    ``use_blk`` (static): cblk_ref is the (ntiles, gather_rows) block
    LIST and the gather indirects through it; otherwise cblk_ref is the
    per-tile contiguous window anchor."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    ps = []
    for u in range(tps):
        t = step * tps + u
        lc = lc_ref[u].astype(jnp.int32)
        if gather_rows > 1 and GATHER_TREE:
            if use_blk:
                g = _gather_blocks_tree(x_ref, cblk_ref, t, lc,
                                        gather_rows)
            else:
                g = _gather_window_tree(x_ref, cblk_ref[t], lc,
                                        gather_rows)
        elif use_blk:
            g = _gather_blocks(x_ref, cblk_ref, t, lc, gather_rows)
        else:
            g = _gather_window(x_ref, cblk_ref[t], lc, gather_rows)
        ps.append(vals_ref[u] * g)
    cs = _prefix_sum_mxu(jnp.concatenate(ps, axis=0), x_ref.dtype)

    for u in range(tps):
        t = step * tps + u
        csu = cs[u * SUBLANES : (u + 1) * SUBLANES]
        G = _extract_rows(csu, ep_ref[u])
        part = _row_diff(G)
        rb = rblk_ref[t]
        y_ref[pl.ds(rb, rspan), :] = y_ref[pl.ds(rb, rspan), :] + part


# v5e cores carry 128 MB of VMEM; Mosaic's default scoped-vmem budget
# is 16 MB, which caps VMEM-resident x/y at ~1.2M rows/cols. Raising
# the limit to what the call actually needs (resident vectors +
# double-buffered per-step payload blocks + compiler slack) unlocks
# multi-million-row single-kernel calls; ops.spmv gates dimensions at
# VMEM_DIM_LIMIT to keep within this budget.
VMEM_CEILING_BYTES = 100 * 1024 * 1024


def _vmem_params(resident_bytes: int, tps: int, rspan: int,
                 idx_bytes: int = 2):
    # idx_bytes: local_cols itemsize — int16 normally, int32 when
    # col_window > 32767 (to_device_tiles promotes); end_pos stays int16
    per_step = 2 * tps * (TILE_NNZ * (4 + idx_bytes)
                          + rspan * LANES * 2)
    need = int(resident_bytes + per_step + 8 * 1024 * 1024)
    if need <= 16 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(need, VMEM_CEILING_BYTES)
    )


@functools.partial(jax.jit, static_argnames=("nrows_out",))
@kernel_no_x64
def _spmv_tiles(A: DeviceTiles, x2d, nrows_out: int):
    ntiles = A.ntiles
    tps = A.tiles_per_step
    steps = ntiles // tps
    rspan = A.row_span
    csize = TILE_NNZ // SUBLANES
    mb = nrows_out // LANES

    use_blk = A.blk_list is not None
    y2d = pl.pallas_call(
        functools.partial(_fused_kernel, A.gather_rows, rspan, tps,
                          use_blk),
        compiler_params=_vmem_params(
            x2d.size * x2d.dtype.itemsize
            + mb * LANES * np.dtype(A.vals.dtype).itemsize, tps, rspan,
            idx_bytes=np.dtype(A.local_cols.dtype).itemsize),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # rblk, cblk, cspan
            grid=(steps,),
            in_specs=[
                pl.BlockSpec(
                    (tps, SUBLANES, csize),
                    lambda i, rb, cb, cs: (i, 0, 0),
                ),
                pl.BlockSpec(
                    (tps, SUBLANES, csize),
                    lambda i, rb, cb, cs: (i, 0, 0),
                ),
                pl.BlockSpec(
                    (tps, rspan, LANES),
                    lambda i, rb, cb, cs: (i, 0, 0),
                ),
                pl.BlockSpec(
                    x2d.shape, lambda i, rb, cb, cs: (0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (mb, LANES), lambda i, rb, cb, cs: (0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((mb, LANES), A.vals.dtype),
        interpret=_interpret(),
    )(A.row_block, A.blk_list if use_blk else A.col_block, A.col_span,
      A.vals, A.local_cols, A.end_pos, x2d)
    return y2d


def _pad_x(A: DeviceTiles, x):
    ncb = -(-A.num_cols // LANES) + A.x_pad_rows
    xp = jnp.zeros((ncb * LANES,), dtype=x.dtype)
    xp = xp.at[: A.num_cols].set(x)
    return xp.reshape(ncb, LANES)


def spmv_merge(A, x, alpha=1.0, beta=0.0, y=None):
    """y = alpha * A @ x + beta * y via the merge-tile kernel (+ jnp
    overflow stream). ``A``: DeviceTiles or ClassedTiles (per-span
    plans run as independent kernels; += into y is order-independent,
    so summing their outputs is exact)."""
    if isinstance(A, ClassedTiles):
        y_new = spmv_merge(A.plans[0], x)
        for p in A.plans[1:]:
            y_new = y_new + spmv_merge(p, x)
        if beta == 0.0 or y is None:
            return alpha * y_new
        return alpha * y_new + beta * y
    x2d = _pad_x(A, x.astype(A.dtype))
    mb = -(-A.num_rows // LANES) + A.y_pad_rows
    y2d = _spmv_tiles(A, x2d, mb * LANES)
    y_new = y2d.reshape(-1)[: A.num_rows]
    if A.ovf_vals.shape[0] > 0:
        from tpusparse.ops.reference import spmv_coo

        y_new = y_new + spmv_coo(
            A.ovf_rows, A.ovf_cols, A.ovf_vals, x.astype(A.dtype),
            A.num_rows,
        )
    if beta == 0.0 or y is None:
        return alpha * y_new
    return alpha * y_new + beta * y
