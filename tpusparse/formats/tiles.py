"""MergeTiles — the TPU-native merge-path tile format (flagship).

This is the TPU re-design of the reference's merge-based SpMV pipeline
(SC'16 Merrill & Garland; reference CUDA implementation in
``cub/agent/agent_spmv_orig.cuh`` + ``cub/device/dispatch/dispatch_spmv_orig.cuh``,
CPU OpenMP implementation in ``work_2025/spmm/merge_based.hpp:22-153``).

The reference finds per-CTA merge-path coordinates at *run time* with a
binary-search kernel (``DeviceSpmvSearchKernel``,
``dispatch_spmv_orig.cuh:104``). On TPU, shapes must be static under XLA,
so the search moves to *matrix-load time*: the host walks the CSR
structure once and emits fixed-capacity tiles with

  * equal-nonzero load balancing (insensitive to row-length skew, the
    merge-path guarantee),
  * a 128-aligned **row window** per tile (all rows of a tile fall in
    ``[row_base, row_base + row_window)``) so the scatter side of the
    kernel is a dense aligned read-modify-write,
  * a tight 128-aligned **column anchor** per tile: nonzeros are
    grouped by gap-split column clusters (see ``build_merge_tiles``),
    so every tile's gathered x entries fall within a small span from
    the anchor — the gather side is a *bounded* number of
    vector-register lane-gathers over genuine band width.

The partition is total for any sparsity pattern (no overflow stream);
padding waste is reported as ``occupancy`` and the ops-layer planner
compares it against the gather-job alternative.

Tile payload layout (all host-precomputed numpy):
  vals       (ntiles, T)        values, zero-padded; flattened order is
                                column-major over an (8, T//8) register
                                tile: linear index p -> (p % 8, p // 8).
  local_cols (ntiles, T)        col - col_base, int32 in [0, Wc).
  end_pos    (ntiles, Wr)       for each local row w: flattened position
                                of the last nonzero with local row <= w,
                                or -1 if none. Row sums then come out of
                                an (unsegmented) tile prefix sum as
                                CS[end_pos[w]] - CS[end_pos[w-1]].
  row_block  (ntiles,)          row_base / 128 (scalar-prefetch).
  col_block  (ntiles,)          col_base / 128 (scalar-prefetch).
  col_span   (ntiles,)          128-blocks the tile's columns touch.
"""

from __future__ import annotations

import dataclasses

import numpy as np

SUBLANES = 8
LANES = 128


def _argsort_u64(keys):
    """Argsort of packed u64 keys. numpy's introsort wins on this
    machine (1 CPU, nearly-sorted keys); the native parallel radix sort
    (utils.native.argsort_u64) wins on multi-core hosts — opt in via
    TPUSPARSE_NATIVE_SORT=1."""
    import os

    if os.environ.get("TPUSPARSE_NATIVE_SORT"):
        try:
            from tpusparse.utils import native

            if native.available():
                return native.argsort_u64(keys)
        except ImportError:
            pass
    return np.argsort(keys)


@dataclasses.dataclass
class MergeTiles:
    """Host-side merge-path tile partition of a CSR matrix."""

    num_rows: int
    num_cols: int
    nnz: int                 # nonzeros held in tiles
    tile_nnz: int            # T — nnz capacity per tile
    row_window: int          # Wr — aligned row window per tile (multiple of 128)
    col_window: int          # Wc — aligned col window per tile (multiple of 128)

    vals: np.ndarray         # (ntiles, T)
    local_cols: np.ndarray   # (ntiles, T) int32
    end_pos: np.ndarray      # (ntiles, Wr) int32
    row_block: np.ndarray    # (ntiles,) int32  (row_base // 128)
    col_block: np.ndarray    # (ntiles,) int32  (col_base // 128)
    col_span: np.ndarray     # (ntiles,) int32  — number of 128-wide x
                             # window rows the tile actually touches; the
                             # kernel's gather loop runs this many
                             # iterations (tight per-tile anchoring)

    # COO overflow stream — always empty with the cluster
    # partitioner; retained so hybrid splits stay expressible
    ovf_rows: np.ndarray
    ovf_cols: np.ndarray
    ovf_vals: np.ndarray

    # Block-list partition (build_block_tiles): per-tile list of the
    # distinct 128-wide x blocks the tile touches, (ntiles, max_blocks)
    # int32, ascending, padded with 0 past col_span entries. When set,
    # local_cols index THROUGH this list (col = blk_list[t, lc // 128]
    # * 128 + lc % 128) and the tile's columns need not be contiguous —
    # the kernel gathers each listed block independently. None for the
    # contiguous-window partition of build_merge_tiles.
    blk_list: np.ndarray | None = None

    # which per-tile span the kernel's span-classing should bucket by:
    # "row" (extraction-bound classic window plans) or "col" (greedy
    # partitions with strongly bimodal gather spans)
    span_class_by: str = "row"

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def overflow_nnz(self) -> int:
        return int(self.ovf_vals.shape[0])

    @property
    def occupancy(self) -> float:
        """Fraction of tile value slots holding real nonzeros."""
        total = self.vals.shape[0] * self.vals.shape[1]
        return self.nnz / total if total else 0.0

    @property
    def overflow_fraction(self) -> float:
        t = self.nnz + self.overflow_nnz
        return self.overflow_nnz / t if t else 0.0


def build_merge_tiles(
    csr,
    tile_nnz: int = 1024,
    row_window: int = 1024,
    col_window: int = 1024,
) -> MergeTiles:
    """Partition a host CsrMatrix into MergeTiles.

    Gap-split clustered partition, fully vectorized and *total* (no
    overflow for any sparsity pattern). Nonzeros are grouped by

        (row window = row // Wr,  column cluster,  sub-cell,  row, col)

    where a *column cluster* is a maximal run of touched 128-wide column
    blocks with no gaps (computed per row window), and wide clusters are
    sub-split into cells of at most ``col_window`` columns. Groups are
    lex-sorted and packed into fixed-capacity tiles of ``tile_nnz``.
    Every tile then satisfies the kernel's invariants by construction:
    all rows in one aligned Wr window, all columns within a
    ``col_window`` span from the tile's aligned anchor, slots sorted by
    row. Distinct diagonals of a banded matrix land in distinct
    clusters, so the kernel's static gather loop only runs over genuine
    contiguous band width (``col_span``), not the worst-case window.

    A row's nonzeros may split across clusters or tiles — the
    sequential-grid combine accumulates the partial sums, exactly like
    the reference's carry fix-up (merge_based.hpp:138-149) but without
    atomics. Equal-capacity tiles preserve the merge-path load-balance
    guarantee; padding waste is reported as ``occupancy``.
    """
    assert tile_nnz % SUBLANES == 0
    assert row_window % LANES == 0 and col_window % LANES == 0
    T, Wr, Wc = tile_nnz, row_window, col_window
    G = Wc // LANES  # max col blocks per cell

    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    va = np.asarray(csr.values)
    M = csr.num_rows
    nnz = int(ci.shape[0])
    dtype = va.dtype

    if nnz == 0:
        return MergeTiles(
            num_rows=M, num_cols=csr.num_cols, nnz=0, tile_nnz=T,
            row_window=Wr, col_window=Wc,
            vals=np.zeros((1, T), dtype=dtype),
            local_cols=np.zeros((1, T), dtype=np.int32),
            end_pos=np.full((1, Wr), -1, dtype=np.int32),
            row_block=np.zeros(1, dtype=np.int32),
            col_block=np.zeros(1, dtype=np.int32),
            col_span=np.zeros(1, dtype=np.int32),
            ovf_rows=np.zeros(0, dtype=np.int32),
            ovf_cols=np.zeros(0, dtype=np.int32),
            ovf_vals=np.zeros(0, dtype=dtype),
        )

    # Native single-pass partitioner (counting sort per row window,
    # native/src/merge_tiles.cpp) — bit-identical output, ~20x faster
    # than the numpy sort pipeline at 7M nnz. TPUSPARSE_NO_NATIVE=1
    # forces the numpy path (used by the parity tests).
    import os

    if os.environ.get("TPUSPARSE_NO_NATIVE") != "1":
        try:
            from tpusparse.utils import native

            out = native.build_merge_tiles(csr, T, Wr, Wc)
        except ImportError:
            out = None
        if out is not None:
            vals_t, lcols_t, epos_t, rblk, cblk, cspan = out
            return MergeTiles(
                num_rows=M, num_cols=csr.num_cols, nnz=nnz, tile_nnz=T,
                row_window=Wr, col_window=Wc,
                vals=vals_t, local_cols=lcols_t, end_pos=epos_t,
                row_block=rblk, col_block=cblk, col_span=cspan,
                ovf_rows=np.zeros(0, dtype=np.int32),
                ovf_cols=np.zeros(0, dtype=np.int32),
                ovf_vals=np.zeros(0, dtype=dtype),
            )

    rows_all = np.repeat(np.arange(M, dtype=np.int64), np.diff(ro))
    wid = rows_all // Wr
    colblk = ci // LANES

    # --- pass 1: column clusters per row window --------------------------
    # sort by (wid, colblk) — packed into one u64 key for the parallel
    # native argsort; a cluster break is a wid change or a gap of more
    # than one untouched column block
    nbc = int(colblk.max()) + 2
    o1 = _argsort_u64((wid * nbc + colblk).astype(np.uint64))
    w1, cb1 = wid[o1], colblk[o1]
    new_cluster = np.empty(nnz, dtype=bool)
    new_cluster[0] = True
    new_cluster[1:] = (w1[1:] != w1[:-1]) | (cb1[1:] - cb1[:-1] > 1)
    clu1 = np.cumsum(new_cluster) - 1
    ncl = int(clu1[-1]) + 1
    first_blk = np.full(ncl, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_blk, clu1, cb1)
    # scatter cluster id / anchor back to original order
    cluster = np.empty(nnz, dtype=np.int64)
    cluster[o1] = clu1
    # sub-split wide clusters into cells of at most G col blocks
    subcell = (colblk - first_blk[cluster]) // G
    anchor_blk = first_blk[cluster] + subcell * G  # per-entry cell anchor

    # --- pass 2: group by (wid, cluster, subcell), order by (row, col) --
    # packed key: ((cluster, subcell), local row, local col) — local
    # coordinates fit the window bounds, keeping the key within 64 bits
    lrow = rows_all - wid * Wr
    lcol = ci - (first_blk[cluster] + subcell * G) * LANES
    nsub = int(subcell.max()) + 2
    key2 = (
        ((cluster * nsub + subcell) * Wr + lrow) * Wc + lcol
    ).astype(np.uint64)
    order = _argsort_u64(key2)
    r_s, c_s, v_s = rows_all[order], ci[order], va[order]
    wid_s = wid[order]
    clu_s, sub_s = cluster[order], subcell[order]

    new_group = np.empty(nnz, dtype=bool)
    new_group[0] = True
    new_group[1:] = (clu_s[1:] != clu_s[:-1]) | (sub_s[1:] != sub_s[:-1])
    group_id = np.cumsum(new_group) - 1
    group_start = np.flatnonzero(new_group)
    offset_in_group = np.arange(nnz) - group_start[group_id]

    # tile breaks: every group start and every T-th slot within a group
    new_tile = new_group | (offset_in_group % T == 0)
    tile_id = np.cumsum(new_tile) - 1
    ntiles = int(tile_id[-1]) + 1
    slot = offset_in_group % T

    tile_start = np.flatnonzero(new_tile)
    rblk = (wid_s[tile_start] * (Wr // LANES)).astype(np.int32)

    # Tight per-tile column anchor within the cell: col_span counts the
    # 128-wide x rows actually touched — the kernel's static gather loop
    # runs max(col_span) iterations.
    cmin_t = np.full(ntiles, np.iinfo(np.int64).max, dtype=np.int64)
    cmax_t = np.full(ntiles, -1, dtype=np.int64)
    np.minimum.at(cmin_t, tile_id, c_s)
    np.maximum.at(cmax_t, tile_id, c_s)
    cbase_t = (cmin_t // LANES) * LANES
    cblk = (cbase_t // LANES).astype(np.int32)
    cspan = ((cmax_t - cbase_t) // LANES + 1).astype(np.int32)

    vals_t = np.zeros((ntiles, T), dtype=dtype)
    lcols_t = np.zeros((ntiles, T), dtype=np.int32)
    vals_t[tile_id, slot] = v_s
    lcols_t[tile_id, slot] = (c_s - cbase_t[tile_id]).astype(np.int32)

    # end_pos[t, w] = last slot in tile t with local row <= w, else -1
    lrow = (r_s - wid_s * Wr).astype(np.int64)  # in [0, Wr)
    epos_t = np.full((ntiles, Wr), -1, dtype=np.int64)
    np.maximum.at(epos_t, (tile_id, lrow), slot)
    epos_t = np.maximum.accumulate(epos_t, axis=1)

    return MergeTiles(
        num_rows=M,
        num_cols=csr.num_cols,
        nnz=nnz,
        tile_nnz=T,
        row_window=Wr,
        col_window=Wc,
        vals=vals_t,
        local_cols=lcols_t,
        end_pos=epos_t.astype(np.int32),
        row_block=rblk,
        col_block=cblk,
        col_span=cspan,
        ovf_rows=np.zeros(0, dtype=np.int32),
        ovf_cols=np.zeros(0, dtype=np.int32),
        ovf_vals=np.zeros(0, dtype=dtype),
    )


def _block_prep(csr, row_window):
    """Shared sort stage of :func:`build_block_tiles`: entries ordered
    by (row window, column block, row, col) with the dense block rank.
    One call serves every ``max_blocks`` candidate in
    :func:`choose_partition` (the sort dominates build time)."""
    Wr = row_window
    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    M = csr.num_rows
    nnz = int(ci.shape[0])
    rows_all = np.repeat(np.arange(M, dtype=np.int64), np.diff(ro))
    wid = rows_all // Wr
    colblk = ci // LANES
    # local coords keep the packed sort key within 64 bits
    nbc = int(colblk.max()) + 1
    lrow = rows_all - wid * Wr
    key = ((wid * nbc + colblk) * Wr + lrow) * LANES + (ci % LANES)
    o = _argsort_u64(key.astype(np.uint64))
    w_s, cb_s, r_s, c_s = wid[o], colblk[o], rows_all[o], ci[o]
    # dense block rank: one increment per (wid, colblk) run
    newblk = np.empty(nnz, dtype=bool)
    newblk[0] = True
    newblk[1:] = (w_s[1:] != w_s[:-1]) | (cb_s[1:] != cb_s[:-1])
    brank = np.cumsum(newblk)  # 1-based, monotone
    return o, w_s, cb_s, r_s, c_s, brank


def _block_cuts(prep, tile_nnz, max_blocks, contiguous=False):
    """Greedy tile cut points for a (tile_nnz, max_blocks) budget:
    O(ntiles) searchsorted steps over the prep arrays. ``contiguous``
    budgets the ABSOLUTE 128-block span (last - first + 1, including
    untouched gap blocks) instead of the touched-block count — the cut
    rule for the variable-width window partition, whose tiles keep the
    cheap contiguous-window kernel gather."""
    _, w_s, cb_s, _, _, brank = prep
    nnz = len(w_s)
    starts = []
    s = 0
    while s < nnz:
        starts.append(s)
        e_nnz = s + tile_nnz
        e_wid = int(np.searchsorted(w_s, w_s[s], side="right"))
        if contiguous:
            # cb_s ascends within the row-window run [s, e_wid)
            e_blk = s + int(np.searchsorted(
                cb_s[s:e_wid], cb_s[s] + max_blocks, side="left"))
        else:
            e_blk = int(np.searchsorted(brank, brank[s] + max_blocks,
                                        side="left"))
        s = min(e_nnz, e_blk, e_wid)
    return np.asarray(starts, dtype=np.int64)


def build_block_tiles(
    csr,
    tile_nnz: int = 1024,
    row_window: int = 1024,
    max_blocks: int = 16,
    contiguous: bool = False,
    _prep=None,
) -> MergeTiles:
    """Block-LIST partition: tiles pack nonzeros from ARBITRARY columns.

    ``build_merge_tiles`` requires every tile's columns to sit in one
    contiguous window below a single 128-aligned anchor — on power-law
    patterns (R-MAT) the gap-split clusters shatter into many underfull
    tiles (occupancy 0.37 on rmat-16, and occupancy multiplies EVERY
    per-slot kernel cost). This partitioner drops the contiguity
    constraint: a tile instead carries an explicit list of at most
    ``max_blocks`` distinct 128-wide x blocks, and the kernel gathers
    each listed block independently (same static loop length as the
    window span it replaces, one extra scalar indirection).

    Entries are sorted by (row window, column block, row, col) and cut
    into tiles greedily: a tile closes at ``tile_nnz`` nonzeros, at
    ``max_blocks`` distinct column blocks, or at a row-window boundary,
    whichever comes first — so a hub block with thousands of entries
    fills whole span-1 tiles while supersparse regions pool up to
    ``max_blocks`` blocks to fill theirs. An entry run belonging to one
    block may split across tiles (both tiles list the block); the
    sequential-grid y accumulation makes the split exact, like any
    merge-tile row split.

    Kernel invariants preserved: all rows of a tile in one aligned
    ``row_window``; slots sorted by row within the tile; ``col_span``
    = list length <= max_blocks; ``local_cols`` in
    [0, max_blocks * 128).

    ``contiguous=True`` applies the same greedy nnz/span cuts but
    budgets the ABSOLUTE block span (including untouched gap blocks),
    producing variable-width contiguous-WINDOW tiles (no block list):
    the kernel keeps its cheap one-slice window gather, while the
    variable cut still adapts tile width to local density — the middle
    ground that wins when most blocks in a region are touched anyway.

    Reference capability: the merge-based SpMV's equal-nnz load
    balancing (``cub/agent/agent_spmv_orig.cuh:289-406``) on the
    scattered/power-law matrices it targets; the block list is the TPU
    answer to the GPU's free shared-memory gather — there is no
    counterpart structure in the reference.
    """
    assert tile_nnz % SUBLANES == 0
    assert row_window % LANES == 0
    T, Wr, G = tile_nnz, row_window, max_blocks

    va = np.asarray(csr.values)
    M = csr.num_rows
    nnz = int(np.asarray(csr.col_indices).shape[0])
    dtype = va.dtype

    if nnz == 0:
        e = build_merge_tiles(csr, T, Wr, LANES)
        if not contiguous:
            e.blk_list = np.zeros((1, 1), dtype=np.int32)
        e.span_class_by = "col"
        return e

    # Native single-pass partitioner (block histogram + greedy walk +
    # two counting sorts per window, native/src/block_tiles.cpp) —
    # bit-identical output, no nnz-scale sorts. TPUSPARSE_NO_NATIVE=1
    # forces the numpy path (used by the parity tests).
    import os

    if os.environ.get("TPUSPARSE_NO_NATIVE") != "1" and _prep is None:
        try:
            from tpusparse.utils import native

            out = native.build_block_tiles(csr, T, Wr, G, contiguous)
        except ImportError:
            out = None
        if out is not None:
            vals_t, lcols_t, epos_t, rblk, cblk, cspan, nblk = out
            Gmax = max(int(cspan.max()), 1)
            return MergeTiles(
                num_rows=M, num_cols=csr.num_cols, nnz=nnz, tile_nnz=T,
                row_window=Wr, col_window=Gmax * LANES,
                vals=vals_t, local_cols=lcols_t, end_pos=epos_t,
                row_block=rblk, col_block=cblk, col_span=cspan,
                ovf_rows=np.zeros(0, dtype=np.int32),
                ovf_cols=np.zeros(0, dtype=np.int32),
                ovf_vals=np.zeros(0, dtype=dtype),
                blk_list=nblk,
                span_class_by="col",
            )

    prep = _prep if _prep is not None else _block_prep(csr, Wr)
    o, w_s, cb_s, r_s, c_s, brank = prep
    v_s = va[o]

    starts = _block_cuts(prep, T, G, contiguous=contiguous)
    ntiles = len(starts)
    lens = np.diff(np.append(starts, nnz))
    tile_of = np.repeat(np.arange(ntiles, dtype=np.int64), lens)

    if contiguous:
        # variable-width WINDOW tiles: local cols relative to the
        # tile's first touched block (absolute span <= max_blocks by
        # the cut rule); the kernel keeps its contiguous-window gather
        blkidx = (cb_s - cb_s[starts][tile_of]).astype(np.int64)
        blk_list = None
    else:
        # per-entry block index within its tile (< G by construction)
        blkidx = (brank - brank[starts][tile_of]).astype(np.int64)
    lcol_s = blkidx * LANES + (c_s % LANES)

    Gmax = int(blkidx.max()) + 1
    if not contiguous:
        # block lists: ascending by construction (entries colblk-sorted)
        blk_list = np.zeros((ntiles, Gmax), dtype=np.int32)
        blk_list[tile_of, blkidx] = cb_s
    cspan = np.zeros(ntiles, dtype=np.int64)
    np.maximum.at(cspan, tile_of, blkidx + 1)

    # re-sort within each tile by (row, col): tiles are contiguous
    # runs, so one stable lexsort with tile as the primary key does it
    o2 = np.lexsort((c_s, r_s, tile_of))
    t2, r2, v2, l2 = tile_of[o2], r_s[o2], v_s[o2], lcol_s[o2]
    slot = np.arange(nnz, dtype=np.int64) - starts[t2]

    vals_t = np.zeros((ntiles, T), dtype=dtype)
    lcols_t = np.zeros((ntiles, T), dtype=np.int32)
    vals_t[t2, slot] = v2
    lcols_t[t2, slot] = l2.astype(np.int32)

    wid_t = w_s[starts]
    rblk = (wid_t * (Wr // LANES)).astype(np.int32)

    lrow2 = (r2 - wid_t[t2] * Wr).astype(np.int64)
    epos_t = np.full((ntiles, Wr), -1, dtype=np.int64)
    np.maximum.at(epos_t, (t2, lrow2), slot)
    epos_t = np.maximum.accumulate(epos_t, axis=1)

    return MergeTiles(
        num_rows=M,
        num_cols=csr.num_cols,
        nnz=nnz,
        tile_nnz=T,
        row_window=Wr,
        col_window=Gmax * LANES,  # local_cols bound (int16-safe)
        vals=vals_t,
        local_cols=lcols_t,
        end_pos=epos_t.astype(np.int32),
        row_block=rblk,
        col_block=cb_s[starts].astype(np.int32),
        col_span=cspan.astype(np.int32),
        ovf_rows=np.zeros(0, dtype=np.int32),
        ovf_cols=np.zeros(0, dtype=np.int32),
        ovf_vals=np.zeros(0, dtype=dtype),
        blk_list=blk_list,
        span_class_by="col",
    )


# Per-tile cost model for the family choice, calibrated on real-TPU
# interleaved A/B sweeps (R-MAT 14/16, spreads <= 0.11; RESULTS.md):
#   cost ~ 1 + 0.036 * weighted-col-span + 0.1 * row-span-bound
# reproduces every measured per-tile time within ~15% (unit 50-58 ns).
_CS_COEF = 0.036
_RS_COEF = 0.1
# classic wins whenever its occupancy holds up (measured: 20.0 vs
# 15.4 GF on rmat-14 at occ 0.861) — its row-span classes keep most
# tiles' extraction tiny, which the greedy cut cannot reproduce
_CLASSIC_OCC_GATE = 0.8
# greedy (row_window, max_blocks) candidate grid, scored natively in
# one call (no sorts); the numpy fallback scores a small subset
_GREEDY_CANDS = [(1024, 8), (1024, 16), (1024, 32), (1024, 64),
                 (512, 16), (512, 32), (512, 64),
                 (256, 8), (256, 16)]


def choose_partition(csr, tile_nnz: int = 1024) -> MergeTiles:
    """Pick the best merge partition FAMILY and parameters per matrix:

    * the gap-split contiguous-window partition (``build_merge_tiles``
      + ``choose_tiling``) when its packing occupancy holds up —
      banded / stencil-like / moderately-skewed patterns;
    * the greedy variable-width window partition
      (``build_block_tiles(contiguous=True)``) when window clustering
      shatters — the scattered / power-law regime (rmat-16: occupancy
      0.375 -> 0.795, measured 6.4 -> 13.9 GF, 2.2x).

    Occupancy divides every per-slot kernel cost, so the score is
    occupancy over the calibrated per-tile cost model above. The TPU
    analogue of the reference's per-arch dispatch policy
    (``dispatch_spmv_orig.cuh:266-424``) extended with a per-matrix
    partition-family choice."""
    fam = choose_partition_params(csr, tile_nnz)
    return build_partition_from_params(csr, fam, tile_nnz)


def build_nnz_split_tiles(csr, tile_nnz: int = 1024,
                          row_window: int = 1024) -> MergeTiles:
    """PURE equal-nnz partition — the reference's NONZERO_SPLIT
    strategy (``work_2025/spmm/nonzero_splitting.hpp:19-152``: each
    worker takes nnz/p consecutive nonzeros, rows split mid-stream) as
    its own benchmarkable plan family.

    Tiles cut ONLY at ``tile_nnz`` nonzeros and at the kernel's
    row-window invariant; the column-block budget is unbounded
    (``max_blocks=tile_nnz`` can never trigger before the nnz cut), so
    NO locality clustering is applied — unlike ``choose_partition``'s
    merge families, whose gap-split / greedy-span cuts trade a few
    percent of slot occupancy for bounded gather loops. On scattered
    patterns the resulting per-tile column span (and hence the static
    gather trip count) grows with the scatter, which is exactly the
    cost the merge families' clustering avoids — the measured A/B that
    justifies AUTO never selecting this family lives in RESULTS.md.
    """
    return build_block_tiles(csr, tile_nnz, row_window=row_window,
                             max_blocks=tile_nnz, contiguous=False)


def build_partition_from_params(csr, fam, tile_nnz: int = 1024
                                ) -> MergeTiles:
    """Build the partition named by a :func:`choose_partition_params`
    tuple — the ONE place the family tag maps to a builder (shared by
    the single-chip chooser and the sharded planner)."""
    if fam[0] == "classic":
        return build_merge_tiles(csr, tile_nnz, row_window=fam[1],
                                 col_window=fam[2])
    if fam[0] == "greedy":
        return build_block_tiles(csr, tile_nnz, row_window=fam[1],
                                 max_blocks=fam[2], contiguous=True)
    raise ValueError(f"unknown partition family {fam!r}")


def choose_partition_params(csr, tile_nnz: int = 1024,
                            return_score: bool = False):
    """The decision behind :func:`choose_partition`, exposed so
    distributed planners can apply ONE family/parameter choice
    uniformly across row shards: ``('classic', row_window,
    col_window)`` or ``('greedy', row_window, max_blocks)``.

    ``return_score=True`` also returns the winner's occupancy-over-
    cost score — the scale both families are ranked on, so scores are
    comparable ACROSS calls on the same nnz stream (the reorder auto-
    gate compares the native vs RCM-permuted ordering this way)."""

    def _ret(fam, score):
        return (fam, score) if return_score else fam

    def _classic_score(occ, wc):
        # same formula as score_classic below (mid-range row-span
        # estimate) so every classic exit reports a comparable score
        return occ / (1.0 + _CS_COEF * (wc // LANES) + _RS_COEF * 4.0)

    if csr.nnz == 0:
        return _ret(("classic", 1024, 1024), 0.0)
    wr, wc = choose_tiling(csr, tile_nnz)
    occ_classic = tiling_efficiency_counts(csr, tile_nnz, wr, wc)
    if occ_classic >= _CLASSIC_OCC_GATE:
        return _ret(("classic", wr, wc), _classic_score(occ_classic, wc))
    # the tuner's pick may trade occupancy for a smaller window; before
    # conceding the family, rescore the whole classic window grid by
    # occupancy over gather trips (row anchoring made the old
    # writeback term obsolete) — e.g. rmat-13's tuned (384, 2048)
    # packs 0.771 but (1024, 2048) packs 0.927 and keeps the family
    best_c = (occ_classic / (1.0 + _CS_COEF * (wc // LANES)), wr, wc,
              occ_classic)
    for wrc, wcc, occ in _classic_grid_occupancies(csr, tile_nnz):
        s = occ / (1.0 + _CS_COEF * (wcc // LANES))
        if s > best_c[0]:
            best_c = (s, wrc, wcc, occ)
    if best_c[3] >= _CLASSIC_OCC_GATE:
        return _ret(("classic", best_c[1], best_c[2]),
                    _classic_score(best_c[3], best_c[2]))
    wr, wc, occ_classic = best_c[1], best_c[2], best_c[3]
    # classic fallback score: static window gather + a mid-range
    # row-span estimate (its real spans are unknown before the build)
    score_classic = occ_classic / (
        1.0 + _CS_COEF * (wc // LANES) + _RS_COEF * 4.0
    )
    best = None
    stats = _greedy_candidate_stats(csr, tile_nnz)
    for (wrg, G), (ntiles, cs_w) in stats.items():
        if ntiles == 0:
            continue
        occ = csr.nnz / (ntiles * tile_nnz)
        rs_w = min(wrg // LANES, 8)
        score = occ / (1.0 + _CS_COEF * cs_w + _RS_COEF * rs_w)
        if best is None or score > best[0]:
            best = (score, wrg, G)
    if best is None or best[0] <= score_classic:
        return _ret(("classic", wr, wc), score_classic)
    return _ret(("greedy", best[1], best[2]), best[0])


def _classic_grid_occupancies(csr, tile_nnz,
                              row_windows=(256, 384, 512, 1024),
                              col_windows=(1024, 2048, 4096, 8192)):
    """(row_window, col_window, occupancy) triples over the classic
    candidate grid — one native call, or a two-pair numpy fallback."""
    import os

    counts = None
    if os.environ.get("TPUSPARSE_NO_NATIVE") != "1":
        try:
            from tpusparse.utils import native

            counts = native.merge_tiling_counts(
                csr, tile_nnz, row_windows, col_windows)
        except ImportError:
            counts = None
    out = []
    if counts is not None:
        for i, wr in enumerate(row_windows):
            for j, wc in enumerate(col_windows):
                nt = int(counts[i, j])
                if nt:
                    out.append((wr, wc, csr.nnz / (nt * tile_nnz)))
        return out
    for wr, wc in ((1024, 2048), (1024, 4096)):
        out.append((wr, wc,
                    tiling_efficiency(csr, tile_nnz, wr, wc)))
    return out


def _greedy_candidate_stats(csr, tile_nnz):
    """{(row_window, max_blocks): (ntiles, weighted col span)} for the
    greedy candidate grid. Native: one linear-walk call for the whole
    grid. Fallback: numpy cuts for a two-candidate subset (the full
    grid would need one nnz-scale sort per row window)."""
    import os

    if os.environ.get("TPUSPARSE_NO_NATIVE") != "1":
        try:
            from tpusparse.utils import native

            out = native.block_tiles_plan(
                csr, tile_nnz, [(w, g, True) for w, g in _GREEDY_CANDS])
        except ImportError:
            out = None
        if out is not None:
            nt, _, hist, _ = out
            stats = {}
            for j, cand in enumerate(_GREEDY_CANDS):
                if nt[j] == 0:
                    stats[cand] = (0, 0.0)
                    continue
                # pow2 class ceilings weighted by tile count — the
                # static gather loop of each span class runs its
                # class-max trip count
                cs_w = float(
                    sum(hist[j, b] * (1 << b) for b in range(8))
                ) / float(nt[j])
                stats[cand] = (int(nt[j]), cs_w)
            return stats
    stats = {}
    prep = _block_prep(csr, 1024)
    for G in (16, 32):
        starts = _block_cuts(prep, tile_nnz, G, contiguous=True)
        ends = np.append(starts[1:], len(prep[1]))
        spans = (prep[2][ends - 1] - prep[2][starts] + 1).astype(np.int64)
        cls = np.maximum(np.ceil(np.log2(spans)), 0)
        cs_w = float(np.exp2(cls).sum()) / max(len(starts), 1)
        stats[(1024, G)] = (len(starts), cs_w)
    return stats


def tiling_efficiency_counts(csr, tile_nnz: int, row_window: int,
                             col_window: int) -> float:
    """Occupancy of a window tiling, via the native counter when
    available (one call) with the numpy fallback."""
    import os

    if csr.nnz and os.environ.get("TPUSPARSE_NO_NATIVE") != "1":
        try:
            from tpusparse.utils import native

            counts = native.merge_tiling_counts(
                csr, tile_nnz, (row_window,), (col_window,))
            if counts is not None:
                nt = int(counts[0, 0])
                return csr.nnz / (nt * tile_nnz) if nt else 0.0
        except ImportError:
            pass
    return tiling_efficiency(csr, tile_nnz, row_window, col_window)


def tiling_efficiency(csr, tile_nnz: int, row_window: int,
                      col_window: int) -> float:
    """Occupancy a (row_window, col_window) tiling would achieve, using
    the same gap-split clustering as :func:`build_merge_tiles` but
    without building the payloads — used by :func:`choose_tiling`."""
    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    nnz = int(ci.size)
    if nnz == 0:
        return 0.0
    G = col_window // LANES
    rows_all = np.repeat(
        np.arange(csr.num_rows, dtype=np.int64), np.diff(ro)
    )
    wid = rows_all // row_window
    colblk = ci // LANES
    o1 = np.lexsort((colblk, wid))
    w1, cb1 = wid[o1], colblk[o1]
    new_cluster = np.empty(nnz, dtype=bool)
    new_cluster[0] = True
    new_cluster[1:] = (w1[1:] != w1[:-1]) | (cb1[1:] - cb1[:-1] > 1)
    clu1 = np.cumsum(new_cluster) - 1
    ncl = int(clu1[-1]) + 1
    first_blk = np.full(ncl, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_blk, clu1, cb1)
    subcell = (cb1 - first_blk[clu1]) // G
    key = clu1 * (subcell.max() + 1) + subcell
    counts = np.bincount(key)
    counts = counts[counts > 0]
    ntiles = int(np.sum(-(-counts // tile_nnz)))
    return nnz / (ntiles * tile_nnz)


def choose_tiling(
    csr,
    tile_nnz: int = 1024,
    row_windows=(256, 384, 512, 1024),
    col_windows=(1024, 2048, 4096, 8192),
    gather_cost_per_128: float = 0.012,
) -> tuple[int, int]:
    """Pick (row_window, col_window) maximizing estimated throughput:
    occupancy discounted by the kernel's per-tile gather-loop cost
    (``col_window/128`` lane-gather select iterations) and the partial
    window writeback (``row_window`` floats per tile)."""
    import os

    nnz = int(np.asarray(csr.col_indices).size)
    counts = None
    if nnz and os.environ.get("TPUSPARSE_NO_NATIVE") != "1":
        try:
            from tpusparse.utils import native

            # one native call scores the whole candidate grid — the
            # numpy fallback re-clusters (lexsort over all nnz) per pair
            counts = native.merge_tiling_counts(
                csr, tile_nnz, row_windows, col_windows)
        except ImportError:
            counts = None
    best = (row_windows[0], col_windows[0])
    best_score = -1.0
    for i, wr in enumerate(row_windows):
        for j, wc in enumerate(col_windows):
            if counts is not None:
                nt = int(counts[i, j])
                occ = nnz / (nt * tile_nnz) if nt else 0.0
            else:
                occ = tiling_efficiency(csr, tile_nnz, wr, wc)
            if occ == 0.0:
                continue
            # relative cost of one tile: compute base 1.0 + gather loop
            # + partials traffic (wr * 8 bytes vs 8 KB tile payload)
            cost = 1.0 + gather_cost_per_128 * (wc // 128) + wr / 1024.0
            score = occ / cost
            if score > best_score:
                best_score = score
                best = (wr, wc)
    return best


def tiles_to_dense(tiles: MergeTiles) -> np.ndarray:
    """Reconstruct the dense matrix from a MergeTiles partition — test
    oracle proving the partition is lossless (tiles + overflow)."""
    d = np.zeros((tiles.num_rows, tiles.num_cols), dtype=tiles.vals.dtype)
    T, Wr = tiles.tile_nnz, tiles.row_window
    for t in range(tiles.ntiles):
        epos = tiles.end_pos[t]
        rbase = int(tiles.row_block[t]) * LANES
        cbase = int(tiles.col_block[t]) * LANES
        # recover local row of each slot from end_pos
        prev = -1
        for w in range(Wr):
            e = int(epos[w])
            if e > prev:
                for p in range(prev + 1, e + 1):
                    lc = int(tiles.local_cols[t, p])
                    if tiles.blk_list is not None:
                        c = (int(tiles.blk_list[t, lc // LANES]) * LANES
                             + lc % LANES)
                    else:
                        c = cbase + lc
                    d[rbase + w, c] += tiles.vals[t, p]
                prev = e
    for r, c, v in zip(tiles.ovf_rows, tiles.ovf_cols, tiles.ovf_vals):
        d[r, c] += v
    return d
