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
                    d[rbase + w, cbase + int(tiles.local_cols[t, p])] += (
                        tiles.vals[t, p]
                    )
                prev = e
    for r, c, v in zip(tiles.ovf_rows, tiles.ovf_cols, tiles.ovf_vals):
        d[r, c] += v
    return d
