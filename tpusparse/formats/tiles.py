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
  * a 128-aligned **column window** per tile (all gathered x entries fall
    in ``[col_base, col_base + col_window)``) so the gather side is a
    bounded number of vector-register lane-gathers.

Entries that cannot satisfy the column window (long-range couplings in
non-banded matrices) go to a COO *overflow stream* processed by the
jnp fallback — the classic hybrid-format split. For banded / RCM-ordered
SPD matrices (the CG workload) the overflow is empty.

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
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

SUBLANES = 8
LANES = 128


@dataclasses.dataclass
class MergeTiles:
    """Host-side merge-path tile partition of a CSR matrix."""

    num_rows: int
    num_cols: int
    nnz: int                 # in-window nonzeros (excl. overflow)
    tile_nnz: int            # T — nnz capacity per tile
    row_window: int          # Wr — aligned row window per tile (multiple of 128)
    col_window: int          # Wc — aligned col window per tile (multiple of 128)

    vals: np.ndarray         # (ntiles, T)
    local_cols: np.ndarray   # (ntiles, T) int32
    end_pos: np.ndarray      # (ntiles, Wr) int32
    row_block: np.ndarray    # (ntiles,) int32  (row_base // 128)
    col_block: np.ndarray    # (ntiles,) int32  (col_base // 128)

    # COO overflow stream (jnp fallback path)
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
    row_window: int = 384,
    col_window: int = 2048,
) -> MergeTiles:
    """Partition a host CsrMatrix into MergeTiles.

    Greedy row-granular partitioner (rows longer than ``tile_nnz`` are
    split across tiles): a tile closes when adding the next row chunk
    would exceed the nnz capacity, leave the 128-aligned row window, or
    leave the 128-aligned column window. Per-nonzero column-window
    violations within an otherwise-fitting row go to the overflow stream.
    """
    assert tile_nnz % SUBLANES == 0
    assert row_window % LANES == 0 and col_window % LANES == 0
    T, Wr, Wc = tile_nnz, row_window, col_window

    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    va = np.asarray(csr.values)
    M = csr.num_rows

    # Per-row in-window mask: a *short* row (len <= T) keeps entries with
    # col < first_col + Wc - 128 (cols are sorted within a row); the rest
    # overflow. The 128 slack covers base alignment. Long rows (len > T)
    # are exempt — they are split into chunks in the tile walk below, and
    # each chunk gets its own column window.
    row_len = np.diff(ro)
    nonempty = np.flatnonzero(row_len > 0)
    first_col = np.zeros(M, dtype=np.int64)
    first_col[nonempty] = ci[ro[nonempty]]

    rows_all = np.repeat(np.arange(M, dtype=np.int64), row_len)
    in_window = (ci < (first_col[rows_all] + (Wc - LANES))) | (
        row_len[rows_all] > T
    )

    ovf_rows = rows_all[~in_window].astype(np.int32)
    ovf_cols = ci[~in_window].astype(np.int32)
    ovf_vals = va[~in_window]

    # Compact the in-window stream.
    rows_w = rows_all[in_window]
    cols_w = ci[in_window]
    vals_w = va[in_window]
    len_w = np.bincount(rows_w, minlength=M).astype(np.int64)
    ro_w = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(len_w, out=ro_w[1:])
    nnz_w = int(ro_w[-1])

    # Per-row column range (over the windowed stream).
    cmin = np.full(M, np.iinfo(np.int64).max, dtype=np.int64)
    cmax = np.full(M, -1, dtype=np.int64)
    if nnz_w:
        np.minimum.at(cmin, rows_w, cols_w)
        np.maximum.at(cmax, rows_w, cols_w)

    # --- greedy tile walk (over rows; long rows split by nnz chunks) ----
    tiles = []  # (nnz_start, nnz_end, row_start_aligned)
    r = 0
    p = 0  # position in windowed nnz stream
    while p < nnz_w:
        # skip empty rows
        while r < M and len_w[r] == 0:
            r += 1
        if r >= M:
            break
        row_base = (r // LANES) * LANES
        tile_cmin = cmin[r]
        tile_cmax = cmax[r]
        start = p
        # Long-row chunk: consume up to T nnz of this row as its own tile,
        # breaking also at column-window boundaries (cols ascend within a
        # row, so a window break is a searchsorted on the chunk's cols).
        if len_w[r] > T or (ro_w[r + 1] - p) > T:
            row_end = int(ro_w[r + 1])
            cbase = (cols_w[p] // LANES) * LANES
            end = min(p + T, row_end)
            # shrink to the column window anchored at the chunk start
            end = p + int(
                np.searchsorted(cols_w[p:end], cbase + Wc, side="left")
            )
            tiles.append((start, end, row_base, cbase))
            p = end
            if p >= row_end:
                r += 1
            continue
        # Normal: greedily add whole rows.
        while r < M:
            if len_w[r] == 0:
                r += 1
                continue
            row_end_nnz = ro_w[r + 1]
            new_cmin = min(tile_cmin, cmin[r])
            new_cmax = max(tile_cmax, cmax[r])
            cbase = (new_cmin // LANES) * LANES
            fits_nnz = (row_end_nnz - start) <= T
            fits_rows = r < row_base + Wr
            fits_cols = (new_cmax - cbase) < Wc
            if fits_nnz and fits_rows and fits_cols:
                tile_cmin, tile_cmax = new_cmin, new_cmax
                p = int(row_end_nnz)
                r += 1
            else:
                break
        cbase = (tile_cmin // LANES) * LANES
        tiles.append((start, p, row_base, cbase))

    ntiles = max(len(tiles), 1)
    vals_t = np.zeros((ntiles, T), dtype=va.dtype)
    lcols_t = np.zeros((ntiles, T), dtype=np.int32)
    epos_t = np.full((ntiles, Wr), -1, dtype=np.int32)
    rblk = np.zeros(ntiles, dtype=np.int32)
    cblk = np.zeros(ntiles, dtype=np.int32)

    # Flattened order within a tile is column-major over (8, T//8):
    # linear slot s (CSR order) sits at register position p = s, with
    # (sublane, lane-col) = (p % 8, p // 8). end_pos stores p directly.
    for t, (s0, s1, rbase, cbase) in enumerate(tiles):
        n = s1 - s0
        vals_t[t, :n] = vals_w[s0:s1]
        lcols_t[t, :n] = cols_w[s0:s1] - cbase
        rblk[t] = rbase // LANES
        cblk[t] = cbase // LANES
        # end_pos: last slot with local row <= w, running maximum.
        lrows = rows_w[s0:s1] - rbase  # in [0, Wr)
        # slots are CSR-ordered => lrows is non-decreasing
        last_slot = np.full(Wr, -1, dtype=np.int64)
        np.maximum.at(last_slot, lrows, np.arange(n))
        epos_t[t] = np.maximum.accumulate(last_slot)

    return MergeTiles(
        num_rows=csr.num_rows,
        num_cols=csr.num_cols,
        nnz=nnz_w,
        tile_nnz=T,
        row_window=Wr,
        col_window=Wc,
        vals=vals_t,
        local_cols=lcols_t,
        end_pos=epos_t,
        row_block=rblk,
        col_block=cblk,
        ovf_rows=ovf_rows,
        ovf_cols=ovf_cols,
        ovf_vals=ovf_vals,
    )


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
