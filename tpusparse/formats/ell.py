"""EllTiles — gather-job tile format (the row-splitting analogue).

TPU re-design of the reference's row-splitting decomposition
(``OmpCsrSpmmT``, ``/root/reference/work_2025/spmm/row_splitting.hpp:18-56``:
one OpenMP thread per row, SIMD over the RHS lanes). On TPU the "thread
per row" becomes "vector lane per row", and the irregular per-row
column streams are regularized into *gather jobs*:

  a job = the entries of one aligned 128-row block that fall in one
  128-wide column block, at one per-(row, column-block) occurrence
  rank — i.e. at most ONE entry per lane.

Each job therefore needs exactly one (L, 128) x-block read, one
hardware lane-gather, one multiply and one accumulate — no select
loops, no spans, no scans, no scatters. Jobs of a row block are packed
into fixed-capacity tiles (J jobs per tile) kept consecutive so the
output block is revisited and accumulated in VMEM.

Trade-off vs MergeTiles: the job count grows with row-length variance
and column scatter (a wheel-hub row or uniformly random columns produce
mostly-empty jobs), so ``ell_occupancy_estimate`` gates the strategy at
plan time — the same multi-strategy philosophy as the reference's
SIMPLE / MERGE / NONZERO_SPLIT selection.
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
JOBS_PER_TILE = 16  # measured optimum on v5e (J=8: 140 GF, J=16: 182 GF, J=32: 108 GF at L=32)


@dataclasses.dataclass
class EllTiles:
    """Host-side gather-job partition of a CSR matrix."""

    num_rows: int
    num_cols: int
    nnz: int
    jobs_per_tile: int

    vals: np.ndarray          # (ntiles, J, 128); [t, j, lane] = value of
                              # job j's entry in row rb*128+lane (0 pad)
    local_cols: np.ndarray    # (ntiles, J, 128) int32 in [0, 128)
    row_block: np.ndarray     # (ntiles,) int32 — output block index
    new_block: np.ndarray     # (ntiles,) int32 — 1 on the first tile of
                              # each row block (zero the out block)
    job_cblk: np.ndarray      # (ntiles*J,) int32 — x block per job

    @property
    def ntiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def occupancy(self) -> float:
        total = self.vals.size
        return self.nnz / total if total else 0.0


def _job_structure(csr):
    """Shared by the builder and the estimator: per-entry (rb, cblk,
    rank) job keys, sorted; returns (order, rb_s, job ids, lanes,
    njobs_per_rowblock)."""
    ro = np.asarray(csr.row_offsets).astype(np.int64)
    ci = np.asarray(csr.col_indices).astype(np.int64)
    M = csr.num_rows
    nnz = int(ci.shape[0])
    rows = np.repeat(np.arange(M, dtype=np.int64), np.diff(ro))
    rb = rows // LANES
    cblk = ci // LANES

    # rank of the entry within its (row, column-block): the CSR stream
    # is already (row, col)-sorted, so (row, cblk) segments are
    # contiguous runs — no sort needed. Debug-mode guard for hand-built
    # CsrMatrix instances violating the sortedness invariant (silently
    # wrong payloads otherwise).
    assert nnz == 0 or bool(
        np.all((rows[1:] != rows[:-1]) | (ci[1:] >= ci[:-1]))
    ), "CsrMatrix col_indices must be sorted within each row"
    new_rc = np.empty(nnz, dtype=bool)
    new_rc[0] = True
    new_rc[1:] = (rows[1:] != rows[:-1]) | (cblk[1:] != cblk[:-1])
    seg = np.cumsum(new_rc) - 1
    seg_start = np.flatnonzero(new_rc)
    rank = np.arange(nnz) - seg_start[seg]

    # enumerate jobs sorted by (rb, cblk, rank) — packed key when the
    # rank fits 12 bits (it exceeds 128 only with duplicate entries)
    if int(rank.max()) < 4096:
        nbc2 = int(cblk.max()) + 2
        o2 = _argsort_u64(
            (((rb * nbc2 + cblk) << 12) | rank).astype(np.uint64)
        )
    else:
        o2 = np.lexsort((rank, cblk, rb))
    rb2, cb2, rk2 = rb[o2], cblk[o2], rank[o2]
    new_job = np.empty(nnz, dtype=bool)
    new_job[0] = True
    new_job[1:] = (
        (rb2[1:] != rb2[:-1]) | (cb2[1:] != cb2[:-1])
        | (rk2[1:] != rk2[:-1])
    )
    job_id = np.cumsum(new_job) - 1
    njobs = int(job_id[-1]) + 1
    nb = max(-(-M // LANES), 1)
    jobs_rb = np.bincount(rb2[new_job], minlength=nb).astype(np.int64)
    return o2, rb2, cb2, job_id, rows[o2] % LANES, ci[o2] % LANES, \
        new_job, jobs_rb, nb


def _jobs_per_rowblock(csr):
    """Per-row-block gather-job counts for the planner — one native
    linear walk when the library is available (the sort-based fallback
    costs seconds at 10M nnz)."""
    import os

    if os.environ.get("TPUSPARSE_NO_NATIVE") != "1":
        try:
            from tpusparse.utils import native

            jr = native.ell_jobs_per_rowblock(csr)
            if jr is not None:
                return jr
        except ImportError:
            pass
    *_, jobs_rb, _nb = _job_structure(csr)
    return jobs_rb


def ell_occupancy_estimate(csr, jobs_per_tile: int = JOBS_PER_TILE
                           ) -> float:
    """Occupancy the gather-job packing would achieve (jobs counted
    without building payloads)."""
    if csr.nnz == 0:
        return 0.0
    jobs_rb = _jobs_per_rowblock(csr)
    tiles = np.maximum(-(-jobs_rb // jobs_per_tile), 1)
    total = int(tiles.sum()) * jobs_per_tile * LANES
    return csr.nnz / total if total else 0.0


def choose_jobs_per_tile(csr, candidates=(8, 16)) -> tuple[int, float]:
    """Pick the tile job capacity maximizing estimated throughput:
    larger J amortizes per-grid-step overhead but wastes slots when row
    blocks have few jobs. Model: time ~ ntiles * (c0 + J), c0 ~ 4
    (measured step overhead relative to per-job work on v5e). Returns
    (J, occupancy at J)."""
    if csr.nnz == 0:
        return candidates[0], 0.0
    jobs_rb = _jobs_per_rowblock(csr)
    best = (candidates[0], 0.0, float("inf"))
    for J in candidates:
        tiles = int(np.maximum(-(-jobs_rb // J), 1).sum())
        occ = csr.nnz / (tiles * J * LANES)
        cost = tiles * (4.0 + J)
        if cost < best[2]:
            best = (J, occ, cost)
    return best[0], best[1]


def build_ell_tiles(csr, jobs_per_tile: int = JOBS_PER_TILE) -> EllTiles:
    """Partition a host CsrMatrix into gather-job EllTiles."""
    va = np.asarray(csr.values)
    M = csr.num_rows
    nnz = int(va.shape[0])
    dtype = va.dtype
    J = jobs_per_tile
    nb = max(-(-M // LANES), 1)

    if nnz == 0:
        return EllTiles(
            num_rows=M, num_cols=csr.num_cols, nnz=0, jobs_per_tile=J,
            vals=np.zeros((nb, J, LANES), dtype=dtype),
            local_cols=np.zeros((nb, J, LANES), dtype=np.int32),
            row_block=np.arange(nb, dtype=np.int32),
            new_block=np.ones(nb, dtype=np.int32),
            job_cblk=np.zeros(nb * J, dtype=np.int32),
        )

    # Native fill: two linear passes per 128-row block (max run length
    # per column block -> job bases, then entry scatter) — replaces the
    # packed-key argsort + fancy-indexing pipeline below with identical
    # output (exact-equality tested). TPUSPARSE_NO_NATIVE=1 forces the
    # numpy path.
    import os

    if os.environ.get("TPUSPARSE_NO_NATIVE") != "1":
        try:
            from tpusparse.utils import native
        except ImportError:
            native = None
        if native is not None:
            jobs_rb_n = native.ell_jobs_per_rowblock(csr)
            if jobs_rb_n is not None:
                ntiles_rb = np.maximum(-(-jobs_rb_n // J), 1)
                tile_base = np.zeros(ntiles_rb.size + 1, dtype=np.int64)
                np.cumsum(ntiles_rb, out=tile_base[1:])
                ntiles = int(tile_base[-1])
                out = native.ell_tiles_fill(csr, J, tile_base, ntiles)
                if out is not None:
                    vals_t, lcols_t, job_cblk = out
                    nb_n = ntiles_rb.size
                    new_block = np.zeros(ntiles, dtype=np.int32)
                    new_block[tile_base[:-1]] = 1
                    return EllTiles(
                        num_rows=M, num_cols=csr.num_cols, nnz=nnz,
                        jobs_per_tile=J,
                        vals=vals_t.astype(dtype, copy=False),
                        local_cols=lcols_t,
                        row_block=np.repeat(
                            np.arange(nb_n, dtype=np.int32), ntiles_rb
                        ),
                        new_block=new_block,
                        job_cblk=job_cblk,
                    )

    (o2, rb2, cb2, job_id, lane2, lcol2, new_job, jobs_rb, nb) = (
        _job_structure(csr)
    )
    v2 = va[o2]

    ntiles_rb = np.maximum(-(-jobs_rb // J), 1)
    tile_base = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(ntiles_rb, out=tile_base[1:])
    ntiles = int(tile_base[-1])

    # job -> (tile, slot): within-rowblock job index
    job_start_rb = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(jobs_rb, out=job_start_rb[1:])
    job_rb = rb2[new_job]          # (njobs,) row block of each job
    job_local = np.arange(job_rb.size) - job_start_rb[job_rb]
    job_tile = tile_base[job_rb] + job_local // J
    job_slot = job_local % J
    job_cblk_arr = cb2[new_job]

    vals = np.zeros((ntiles, J, LANES), dtype=dtype)
    lcols = np.zeros((ntiles, J, LANES), dtype=np.int32)
    t_e = job_tile[job_id]
    s_e = job_slot[job_id]
    vals[t_e, s_e, lane2] = v2
    lcols[t_e, s_e, lane2] = lcol2.astype(np.int32)

    job_cblk = np.zeros(ntiles * J, dtype=np.int32)
    job_cblk[job_tile * J + job_slot] = job_cblk_arr.astype(np.int32)

    row_block = np.repeat(np.arange(nb, dtype=np.int32), ntiles_rb)
    new_block = np.zeros(ntiles, dtype=np.int32)
    new_block[tile_base[:-1]] = 1

    return EllTiles(
        num_rows=M,
        num_cols=csr.num_cols,
        nnz=nnz,
        jobs_per_tile=J,
        vals=vals,
        local_cols=lcols,
        row_block=row_block,
        new_block=new_block,
        job_cblk=job_cblk,
    )


def ell_to_dense(t: EllTiles) -> np.ndarray:
    """Test oracle: reconstruct the dense matrix from EllTiles."""
    d = np.zeros((int(t.row_block.max()) * LANES + LANES, t.num_cols),
                 dtype=t.vals.dtype)
    J = t.jobs_per_tile
    for tile in range(t.ntiles):
        rb = int(t.row_block[tile])
        for j in range(J):
            cblk = int(t.job_cblk[tile * J + j])
            for lane in range(LANES):
                v = t.vals[tile, j, lane]
                if v != 0:
                    c = cblk * LANES + int(t.local_cols[tile, j, lane])
                    d[rb * LANES + lane, c] += v
    return d[: t.num_rows]
