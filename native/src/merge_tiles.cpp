// Native merge-tile partitioner — the host-side "search kernel" of the
// TPU merge-SpMV pipeline (tpusparse/formats/tiles.py documents the
// format; the reference's run-time equivalent is DeviceSpmvSearchKernel,
// cub/device/dispatch/dispatch_spmv_orig.cuh:104, whose search moves to
// matrix-load time under XLA's static shapes).
//
// The numpy builder sorts all nnz entries twice with packed u64 keys
// (~15 s at 7M nnz single-core). This implementation exploits the fact
// that a CSR stream is already (row, col)-sorted, so all entries of one
// Wr-aligned row window are CONTIGUOUS: the whole partition reduces to,
// per window,
//   1. a per-column-block histogram (cnt[] is L2-resident),
//   2. gap-splitting the touched blocks into clusters / Wc-cells,
//   3. a stable counting sort of the window's entries by cell id
//      (stability preserves (row, col) order within each cell),
// all linear passes. Tile order matches the numpy builder exactly
// (windows ascending; clusters by first touched block; cells in block
// order), so the two paths produce bit-identical partitions.
//
// Exported (ctypes, see tpusparse/utils/native.py):
//   merge_tiles_count  — phase A: number of tiles for (T, Wr, Wc)
//   merge_tiles_fill   — phase B: fill caller-allocated payloads
//   merge_tiling_counts— tuner: tile counts for a (Wr x Wc) grid in
//                        one call (replaces 16 numpy lexsorts)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int64_t kLanes = 128;

// Touched column blocks of one row window, ascending, with counts.
// cnt/touched are caller-owned scratch of size nbc (reset via the
// returned touched list to keep the walk O(entries + touched)).
struct WindowBlocks {
  std::vector<int32_t> blocks;  // ascending touched block ids
};

inline void scan_window(const int64_t* ro, const int32_t* ci,
                        int64_t row_lo, int64_t row_hi,
                        int32_t* cnt, WindowBlocks* wb) {
  wb->blocks.clear();
  for (int64_t e = ro[row_lo]; e < ro[row_hi]; e++) {
    int32_t b = ci[e] / kLanes;
    if (cnt[b]++ == 0) wb->blocks.push_back(b);
  }
  std::sort(wb->blocks.begin(), wb->blocks.end());
}

// Chop the window's touched blocks into gap-split clusters and
// Wc-cells; call `cell` with (first_block_of_cell_range, count) for
// each cell in order. Blocks of a cluster are contiguous in block id;
// a cell is a G-block-aligned chunk of its cluster (G = Wc / 128).
template <typename F>
inline void for_each_cell(const std::vector<int32_t>& blocks,
                          const int32_t* cnt, int64_t G, F&& cell) {
  size_t i = 0;
  while (i < blocks.size()) {
    size_t j = i;  // [i, j) = current cluster
    while (j + 1 < blocks.size() && blocks[j + 1] - blocks[j] <= 1) j++;
    int32_t first = blocks[i];
    int64_t count = 0;
    int32_t cell_anchor = first;
    for (size_t k = i; k <= j; k++) {
      int32_t sub_anchor =
          first + static_cast<int32_t>((blocks[k] - first) / G * G);
      if (sub_anchor != cell_anchor) {
        cell(cell_anchor, count);
        cell_anchor = sub_anchor;
        count = 0;
      }
      count += cnt[blocks[k]];
    }
    cell(cell_anchor, count);
    i = j + 1;
  }
}

}  // namespace

extern "C" {

// Phase A: tile count for one (T, Wr, Wc). Returns -1 on bad args.
int64_t merge_tiles_count(int64_t M, int64_t N, int64_t nnz,
                          const int64_t* ro, const int32_t* ci,
                          int64_t T, int64_t Wr, int64_t Wc) {
  if (T <= 0 || Wr % kLanes || Wc % kLanes || nnz < 0) return -1;
  int64_t nbc = N / kLanes + 1;
  int64_t G = Wc / kLanes;
  std::vector<int32_t> cnt(static_cast<size_t>(nbc), 0);
  WindowBlocks wb;
  int64_t ntiles = 0;
  for (int64_t row_lo = 0; row_lo < M; row_lo += Wr) {
    int64_t row_hi = std::min(row_lo + Wr, M);
    if (ro[row_hi] == ro[row_lo]) continue;
    scan_window(ro, ci, row_lo, row_hi, cnt.data(), &wb);
    for_each_cell(wb.blocks, cnt.data(), G,
                  [&](int32_t, int64_t c) { ntiles += (c + T - 1) / T; });
    for (int32_t b : wb.blocks) cnt[b] = 0;
  }
  return ntiles;
}

// Tuner: tile counts for every (Wr, Wc) candidate pair in one call.
// out_tiles[i * ncw + j] = tile count under (wrs[i], wcs[j]). One
// window scan serves all Wc candidates of a given Wr.
void merge_tiling_counts(int64_t M, int64_t N, int64_t nnz,
                         const int64_t* ro, const int32_t* ci,
                         int64_t T, int32_t nwr, const int64_t* wrs,
                         int32_t ncw, const int64_t* wcs,
                         int64_t* out_tiles) {
  int64_t nbc = N / kLanes + 1;
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<int32_t> cnt(static_cast<size_t>(nbc), 0);
    WindowBlocks wb;
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int32_t i = 0; i < nwr; i++) {
      int64_t Wr = wrs[i];
      std::vector<int64_t> tiles(static_cast<size_t>(ncw), 0);
      for (int64_t row_lo = 0; row_lo < M; row_lo += Wr) {
        int64_t row_hi = std::min(row_lo + Wr, M);
        if (ro[row_hi] == ro[row_lo]) continue;
        scan_window(ro, ci, row_lo, row_hi, cnt.data(), &wb);
        for (int32_t j = 0; j < ncw; j++) {
          for_each_cell(wb.blocks, cnt.data(), wcs[j] / kLanes,
                        [&](int32_t, int64_t c) {
                          tiles[static_cast<size_t>(j)] += (c + T - 1) / T;
                        });
        }
        for (int32_t b : wb.blocks) cnt[b] = 0;
      }
      for (int32_t j = 0; j < ncw; j++)
        out_tiles[static_cast<int64_t>(i) * ncw + j] =
            tiles[static_cast<size_t>(j)];
    }
  }
}

// Phase B: fill caller-allocated tile payloads. `vals`/`vals_t` are
// raw buffers of `elsize`-byte elements (f32 or f64); vals_t and
// lcols_t must arrive zero-initialized, epos_t filled with -1.
// Layout parity with the numpy builder (formats/tiles.py):
//   vals_t  (ntiles, T)   lcols_t (ntiles, T)   epos_t (ntiles, Wr)
//   rblk/cblk/cspan (ntiles,)
// Returns 0, or -1 when the tile count disagrees with `ntiles`.
int32_t merge_tiles_fill(int64_t M, int64_t N, int64_t nnz,
                         const int64_t* ro, const int32_t* ci,
                         const void* vals, int32_t elsize,
                         int64_t T, int64_t Wr, int64_t Wc,
                         int64_t ntiles, void* vals_t, int32_t* lcols_t,
                         int32_t* epos_t, int32_t* rblk, int32_t* cblk,
                         int32_t* cspan) {
  int64_t nbc = N / kLanes + 1;
  int64_t G = Wc / kLanes;
  const char* vsrc = static_cast<const char*>(vals);
  char* vdst = static_cast<char*>(vals_t);

  // Per-window first-tile offsets (prefix over per-window tile counts)
  // so windows can fill independently (and in parallel on multi-core
  // hosts).
  int64_t nwin = (M + Wr - 1) / Wr;
  std::vector<int64_t> win_tile_base(static_cast<size_t>(nwin) + 1, 0);
  {
    std::vector<int32_t> cnt(static_cast<size_t>(nbc), 0);
    WindowBlocks wb;
    for (int64_t w = 0; w < nwin; w++) {
      int64_t row_lo = w * Wr, row_hi = std::min(row_lo + Wr, M);
      int64_t t = 0;
      if (ro[row_hi] > ro[row_lo]) {
        scan_window(ro, ci, row_lo, row_hi, cnt.data(), &wb);
        for_each_cell(wb.blocks, cnt.data(), G,
                      [&](int32_t, int64_t c) { t += (c + T - 1) / T; });
        for (int32_t b : wb.blocks) cnt[b] = 0;
      }
      win_tile_base[static_cast<size_t>(w) + 1] =
          win_tile_base[static_cast<size_t>(w)] + t;
    }
  }
  if (win_tile_base[static_cast<size_t>(nwin)] != ntiles) return -1;

  std::vector<int64_t> tile_cmin(static_cast<size_t>(ntiles),
                                 INT64_MAX);
  std::vector<int64_t> tile_cmax(static_cast<size_t>(ntiles), -1);

#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<int32_t> cnt(static_cast<size_t>(nbc), 0);
    // per-block cell id + per-cell cursors for the counting sort
    std::vector<int32_t> cell_of(static_cast<size_t>(nbc), -1);
    WindowBlocks wb;
    std::vector<int64_t> cell_tile_base, cell_cursor;
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int64_t w = 0; w < nwin; w++) {
      int64_t row_lo = w * Wr, row_hi = std::min(row_lo + Wr, M);
      if (ro[row_hi] == ro[row_lo]) continue;
      scan_window(ro, ci, row_lo, row_hi, cnt.data(), &wb);

      cell_tile_base.clear();
      cell_cursor.clear();
      int64_t tbase = win_tile_base[static_cast<size_t>(w)];
      int32_t ncells = 0;
      for_each_cell(wb.blocks, cnt.data(), G,
                    [&](int32_t, int64_t c) {
                      cell_tile_base.push_back(tbase);
                      cell_cursor.push_back(0);
                      tbase += (c + T - 1) / T;
                      ncells++;
                    });
      // map touched blocks -> cell index (cells are block-contiguous
      // and in block order; re-run the chop to label)
      {
        int32_t cidx = -1;
        int32_t prev_anchor = -2;
        size_t i = 0;
        while (i < wb.blocks.size()) {
          size_t j = i;
          while (j + 1 < wb.blocks.size() &&
                 wb.blocks[j + 1] - wb.blocks[j] <= 1)
            j++;
          int32_t first = wb.blocks[i];
          for (size_t k = i; k <= j; k++) {
            int32_t anchor =
                first + static_cast<int32_t>((wb.blocks[k] - first) / G * G);
            if (anchor != prev_anchor) {
              cidx++;
              prev_anchor = anchor;
            }
            cell_of[wb.blocks[k]] = cidx;
          }
          prev_anchor = -2;  // new cluster always starts a new cell
          i = j + 1;
        }
      }

      // stable counting sort by cell: CSR order within a window is
      // (row, col), so per-cell slots come out (row, col)-sorted
      int32_t wrb = static_cast<int32_t>(Wr / kLanes);
      for (int64_t r = row_lo; r < row_hi; r++) {
        int64_t lr = r - row_lo;
        for (int64_t e = ro[r]; e < ro[r + 1]; e++) {
          int32_t c = cell_of[ci[e] / kLanes];
          int64_t idx = cell_cursor[static_cast<size_t>(c)]++;
          int64_t t = cell_tile_base[static_cast<size_t>(c)] + idx / T;
          int64_t s = idx % T;
          std::memcpy(vdst + (t * T + s) * elsize, vsrc + e * elsize,
                      static_cast<size_t>(elsize));
          lcols_t[t * T + s] = ci[e];  // global col; rebased below
          epos_t[t * Wr + lr] = static_cast<int32_t>(s);
          tile_cmin[static_cast<size_t>(t)] =
              std::min(tile_cmin[static_cast<size_t>(t)],
                       static_cast<int64_t>(ci[e]));
          tile_cmax[static_cast<size_t>(t)] =
              std::max(tile_cmax[static_cast<size_t>(t)],
                       static_cast<int64_t>(ci[e]));
          rblk[t] = static_cast<int32_t>(w * wrb);
        }
      }
      for (int32_t b : wb.blocks) {
        cnt[b] = 0;
        cell_of[b] = -1;
      }
    }
  }

  // Post-passes: rebase local cols to the tight per-tile anchor,
  // running-max the end positions, derive col_block / col_span.
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t t = 0; t < ntiles; t++) {
    int64_t cmin = tile_cmin[static_cast<size_t>(t)];
    int64_t cbase = (cmin == INT64_MAX) ? 0 : cmin / kLanes * kLanes;
    cblk[t] = static_cast<int32_t>(cbase / kLanes);
    cspan[t] =
        (tile_cmax[static_cast<size_t>(t)] < 0)
            ? 0
            : static_cast<int32_t>(
                  tile_cmax[static_cast<size_t>(t)] / kLanes -
                  cbase / kLanes + 1);
    int32_t* lc = lcols_t + t * T;
    for (int64_t s = 0; s < T; s++)
      if (lc[s] != 0) lc[s] -= static_cast<int32_t>(cbase);
    // padding slots hold 0 already; an entry at global col == cbase
    // rebases to 0 as well, which is identical to the numpy builder
    int32_t* ep = epos_t + t * Wr;
    int32_t run = -1;
    for (int64_t rr = 0; rr < Wr; rr++) {
      run = std::max(run, ep[rr]);
      ep[rr] = run;
    }
  }
  return 0;
}

// Per-128-row-block gather-job counts for the ELL planner
// (tpusparse/formats/ell.py): jobs(rb) = sum over column blocks of
// max over the block's rows of count(row, cblk) — the number of
// (rb, cblk, rank) jobs the gather-job packing creates. One linear
// walk; the per-column-block max table is L2-resident.
void ell_jobs_per_rowblock(int64_t M, int64_t N, const int64_t* ro,
                           const int32_t* ci, int64_t* out) {
  int64_t nbc = N / kLanes + 1;
  std::vector<int32_t> mx(static_cast<size_t>(nbc), 0);
  std::vector<int32_t> touched;
  int64_t nrb = (M + kLanes - 1) / kLanes;
  for (int64_t b = 0; b < nrb; b++) {
    int64_t r_lo = b * kLanes, r_hi = std::min(r_lo + kLanes, M);
    touched.clear();
    for (int64_t r = r_lo; r < r_hi; r++) {
      int64_t e = ro[r];
      while (e < ro[r + 1]) {
        int32_t cb = ci[e] / kLanes;
        int32_t cnt = 0;
        while (e < ro[r + 1] && ci[e] / kLanes == cb) {
          cnt++;
          e++;
        }
        if (mx[cb] == 0) touched.push_back(cb);
        mx[cb] = std::max(mx[cb], cnt);
      }
    }
    int64_t jobs = 0;
    for (int32_t cb : touched) {
      jobs += mx[cb];
      mx[cb] = 0;
    }
    out[b] = jobs;
  }
}

// ELL gather-job payload fill (tpusparse/formats/ell.py
// build_ell_tiles): job = (128-row block, 128-col block, occurrence
// rank), at most one entry per lane. Jobs of a row block are ordered
// (cblk asc, rank asc) and packed J per tile; `tile_base` (nrb+1) is
// the caller-computed prefix of per-block tile counts (empty blocks
// still own one tile). vals_t/lcols_t/job_cblk arrive zero-filled.
// Row blocks fill disjoint tile ranges, so the loop parallelizes.
int32_t ell_tiles_fill(int64_t M, int64_t N, const int64_t* ro,
                       const int32_t* ci, const void* vals,
                       int32_t elsize, int64_t J,
                       const int64_t* tile_base, int64_t ntiles,
                       void* vals_t, int32_t* lcols_t,
                       int32_t* job_cblk) {
  int64_t nbc = N / kLanes + 1;
  int64_t nrb = (M + kLanes - 1) / kLanes;
  const char* vsrc = static_cast<const char*>(vals);
  char* vdst = static_cast<char*>(vals_t);
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<int32_t> mx(static_cast<size_t>(nbc), 0);
    std::vector<int64_t> jb(static_cast<size_t>(nbc), 0);
    std::vector<int32_t> touched;
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int64_t b = 0; b < nrb; b++) {
      int64_t r_lo = b * kLanes, r_hi = std::min(r_lo + kLanes, M);
      if (ro[r_hi] == ro[r_lo]) continue;
      touched.clear();
      // pass 1: per-column-block max run length = jobs per cblk
      for (int64_t r = r_lo; r < r_hi; r++) {
        int64_t e = ro[r];
        while (e < ro[r + 1]) {
          int32_t cb = ci[e] / kLanes;
          int32_t cnt = 0;
          while (e < ro[r + 1] && ci[e] / kLanes == cb) {
            cnt++;
            e++;
          }
          if (mx[cb] == 0) touched.push_back(cb);
          mx[cb] = std::max(mx[cb], cnt);
        }
      }
      std::sort(touched.begin(), touched.end());
      int64_t base = 0;
      for (int32_t cb : touched) {
        jb[cb] = base;
        base += mx[cb];
      }
      // pass 2: scatter entries into (tile, slot, lane)
      int64_t tb = tile_base[b];
      for (int64_t r = r_lo; r < r_hi; r++) {
        int64_t lane = r % kLanes;
        int64_t e = ro[r];
        while (e < ro[r + 1]) {
          int32_t cb = ci[e] / kLanes;
          int64_t j0 = jb[cb];
          int32_t k = 0;
          while (e < ro[r + 1] && ci[e] / kLanes == cb) {
            int64_t jl = j0 + k;
            int64_t t = tb + jl / J, s = jl % J;
            std::memcpy(vdst + ((t * J + s) * kLanes + lane) * elsize,
                        vsrc + e * elsize,
                        static_cast<size_t>(elsize));
            lcols_t[(t * J + s) * kLanes + lane] = ci[e] % kLanes;
            job_cblk[t * J + s] = cb;
            k++;
            e++;
          }
        }
      }
      for (int32_t cb : touched) {
        mx[cb] = 0;
        jb[cb] = 0;
      }
    }
  }
  (void)ntiles;
  return 0;
}

// Stable (row, col) sort order for COO -> CSR conversion
// (tpusparse/formats/coo.py sorted_by_row; reference conversion uses
// std::stable_sort, sparse_matrix.h:668-704). Counting sort by row
// (stable by construction), then an in-place per-row stable sort by
// column — O(nnz + M + sum row_len log row_len), ~10x numpy's
// packed-key lexsort at 7M nnz on one core; rows parallelize.
void coo_sort_order(int64_t M, int64_t nnz, const int32_t* rows,
                    const int32_t* cols, int64_t* order) {
  std::vector<int64_t> start(static_cast<size_t>(M) + 1, 0);
  for (int64_t e = 0; e < nnz; e++) start[rows[e] + 1]++;
  for (int64_t r = 0; r < M; r++) start[r + 1] += start[r];
  {
    std::vector<int64_t> cur(start.begin(), start.end() - 1);
    for (int64_t e = 0; e < nnz; e++) order[cur[rows[e]]++] = e;
  }
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1024)
#endif
  for (int64_t r = 0; r < M; r++) {
    std::stable_sort(order + start[r], order + start[r + 1],
                     [cols](int64_t a, int64_t b) {
                       return cols[a] < cols[b];
                     });
  }
}

}  // extern "C"
