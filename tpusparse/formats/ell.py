"""EllTiles — layered padded-row tile format (the row-splitting analogue).

TPU re-design of the reference's row-splitting decomposition
(``OmpCsrSpmmT``, ``/root/reference/work_2025/spmm/row_splitting.hpp:18-56``:
one OpenMP thread per row, SIMD over the RHS lanes). On TPU the "thread
per row" becomes "vector lane per row":

  * rows are grouped into aligned blocks of 128 (the lane dimension);
  * each row's nonzeros (column-sorted) are sliced into *layers* of 8
    slots; tile = (row block, layer) holds an (8 slots x 128 rows)
    register tile: element [i, j] is slot i of row rb*128 + j;
  * for regular sparsity patterns, slot position i across the 128 rows
    of a block follows a single (sub-)diagonal, so each of the 8 chunks
    has a *tight per-chunk column anchor* — the gather select-loop runs
    over genuine per-diagonal spans;
  * row sums need **no scan and no scatter at all**: summing the 8
    chunks yields the 128 per-row partials in lane order, and layers of
    the same row block accumulate into the same (revisited) output
    block.

Trade-off vs MergeTiles: padding grows with row-length variance within
a block (the wheel hub row is pathological), so ``ell_occupancy`` is
checked at plan time and skewed matrices route to the merge kernel —
the same multi-strategy philosophy as the reference's SIMPLE / MERGE /
NONZERO_SPLIT selection.
"""

from __future__ import annotations

import dataclasses

import numpy as np

SUBLANES = 8
LANES = 128


@dataclasses.dataclass
class EllTiles:
    """Host-side layered-ELL partition of a CSR matrix."""

    num_rows: int
    num_cols: int
    nnz: int
    gather_rows: int          # static per-chunk gather span (col blocks)

    vals: np.ndarray          # (ntiles, 8, 128)
    local_cols: np.ndarray    # (ntiles, 8, 128) int32, relative to the
                              # chunk anchor: in [0, gather_rows*128)
    row_block: np.ndarray     # (ntiles,) int32 — output block index
    new_block: np.ndarray     # (ntiles,) int32 — 1 on the first layer
                              # of each row block (zero the out block)
    chunk_cblk: np.ndarray    # (ntiles*8,) int32 — per-chunk x anchor

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def occupancy(self) -> float:
        total = self.vals.size
        return self.nnz / total if total else 0.0


def ell_occupancy_estimate(csr) -> float:
    """Occupancy the layered-ELL packing would achieve — cheap plan-time
    check (slots = 8 * sum over row blocks of max ceil(len/8))."""
    lengths = np.diff(np.asarray(csr.row_offsets)).astype(np.int64)
    nb = -(-csr.num_rows // LANES)
    pad = np.zeros(nb * LANES, dtype=np.int64)
    pad[: csr.num_rows] = -(-lengths // SUBLANES)  # layers per row
    layers = pad.reshape(nb, LANES).max(axis=1)
    total_slots = int(layers.sum()) * SUBLANES * LANES
    return csr.nnz / total_slots if total_slots else 0.0


def build_ell_tiles(csr, max_span: int = 64) -> EllTiles:
    """Partition a host CsrMatrix into EllTiles.

    ``max_span`` caps the static gather span; matrices whose chunks
    exceed it should use the merge kernel instead (ops.spmv AUTO
    policy checks ``gather_rows``)."""
    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    va = np.asarray(csr.values)
    M = csr.num_rows
    nnz = int(ci.shape[0])
    dtype = va.dtype
    nb = max(-(-M // LANES), 1)

    if nnz == 0:
        return EllTiles(
            num_rows=M, num_cols=csr.num_cols, nnz=0, gather_rows=1,
            vals=np.zeros((nb, SUBLANES, LANES), dtype=dtype),
            local_cols=np.zeros((nb, SUBLANES, LANES), dtype=np.int32),
            row_block=np.arange(nb, dtype=np.int32),
            new_block=np.ones(nb, dtype=np.int32),
            chunk_cblk=np.zeros(nb * SUBLANES, dtype=np.int32),
        )

    rows = np.repeat(np.arange(M, dtype=np.int64), np.diff(ro))
    k = np.arange(nnz, dtype=np.int64) - ro[rows]  # slot within row
    rb = rows // LANES
    lane = rows % LANES
    layer = k // SUBLANES
    sub = k % SUBLANES

    # layers per row block
    nlayers = np.zeros(nb, dtype=np.int64)
    np.maximum.at(nlayers, rb, layer + 1)
    nlayers = np.maximum(nlayers, 1)  # empty blocks still get one tile
    tile_base = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(nlayers, out=tile_base[1:])
    ntiles = int(tile_base[-1])

    tile_id = tile_base[rb] + layer

    # per-(tile, chunk) column anchor
    key = tile_id * SUBLANES + sub
    cmin = np.full(ntiles * SUBLANES, np.iinfo(np.int64).max,
                   dtype=np.int64)
    cmax = np.full(ntiles * SUBLANES, -1, dtype=np.int64)
    np.minimum.at(cmin, key, ci)
    np.maximum.at(cmax, key, ci)
    touched = cmax >= 0
    anchor = np.zeros(ntiles * SUBLANES, dtype=np.int64)
    anchor[touched] = (cmin[touched] // LANES)
    span = np.ones(ntiles * SUBLANES, dtype=np.int64)
    span[touched] = cmax[touched] // LANES - anchor[touched] + 1
    gather_rows = int(span.max())

    vals = np.zeros((ntiles, SUBLANES, LANES), dtype=dtype)
    lcols = np.zeros((ntiles, SUBLANES, LANES), dtype=np.int32)
    vals[tile_id, sub, lane] = va
    lcols[tile_id, sub, lane] = (ci - anchor[key] * LANES).astype(np.int32)

    row_block = np.repeat(np.arange(nb, dtype=np.int32),
                          nlayers.astype(np.int64))
    new_block = np.zeros(ntiles, dtype=np.int32)
    new_block[tile_base[:-1]] = 1

    return EllTiles(
        num_rows=M,
        num_cols=csr.num_cols,
        nnz=nnz,
        gather_rows=gather_rows,
        vals=vals,
        local_cols=lcols,
        row_block=row_block,
        new_block=new_block,
        chunk_cblk=anchor.astype(np.int32),
    )


def ell_to_dense(t: EllTiles) -> np.ndarray:
    """Test oracle: reconstruct the dense matrix from EllTiles."""
    d = np.zeros((t.row_block.max() * LANES + LANES, t.num_cols),
                 dtype=t.vals.dtype)
    for tile in range(t.ntiles):
        rb = int(t.row_block[tile])
        for i in range(SUBLANES):
            cblk = int(t.chunk_cblk[tile * SUBLANES + i])
            for j in range(LANES):
                v = t.vals[tile, i, j]
                if v != 0:
                    c = cblk * LANES + int(t.local_cols[tile, i, j])
                    d[rb * LANES + j, c] += v
    return d[: t.num_rows]
