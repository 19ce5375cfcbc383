// Native greedy block-tile partitioner (tpusparse/formats/tiles.py
// build_block_tiles documents the format and cut rules; reference
// run-time analogue: the merge-path search of
// cub/device/dispatch/dispatch_spmv_orig.cuh:104, moved to load time).
//
// Two partition families share the greedy cut walk:
//   * block-LIST tiles (contig = 0): a tile may hold up to G DISTINCT
//     touched 128-column blocks from anywhere in its row window;
//   * variable-width WINDOW tiles (contig = 1): a tile's absolute
//     block span (last - first + 1, gaps included) stays <= G.
// A tile also closes at T nonzeros or a row-window boundary. Entries
// of one block may split across tiles (positional cut), exactly like
// the numpy builder — outputs are bit-identical to it (tested).
//
// Exported (ctypes, tpusparse/utils/native.py):
//   block_tiles_plan  — tuner: per-candidate (Wr, G, contig) tile
//                       count, col-span sum, pow2 span histogram and
//                       max span, all in linear walks (no sort)
//   block_tiles_count — tile count + max span for one candidate
//   block_tiles_fill  — fill caller-allocated payloads

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int64_t kLanes = 128;

// Touched column blocks of one row window (ascending) + counts in cnt.
inline void scan_window(const int64_t* ro, const int32_t* ci,
                        int64_t row_lo, int64_t row_hi, int32_t* cnt,
                        std::vector<int32_t>* blocks) {
  blocks->clear();
  for (int64_t e = ro[row_lo]; e < ro[row_hi]; e++) {
    int32_t b = ci[e] / kLanes;
    if (cnt[b]++ == 0) blocks->push_back(b);
  }
  std::sort(blocks->begin(), blocks->end());
}

// Greedy cut walk over one window's touched blocks. Calls
// tile(first_blk, last_blk, used_blocks, nnz_in_tile) per closed tile
// in order; entry-level splits match the numpy positional cuts.
template <typename F>
inline void greedy_walk(const std::vector<int32_t>& blocks,
                        const int32_t* cnt, int64_t T, int64_t G,
                        bool contig, F&& tile) {
  int64_t cur = 0;    // nnz in the open tile
  int64_t used = 0;   // distinct touched blocks in the open tile
  int32_t first = -1, last = -1;
  for (int32_t b : blocks) {
    int64_t c = cnt[b];
    while (c > 0) {
      if (cur > 0) {
        bool blocked = contig ? (static_cast<int64_t>(b) - first >= G)
                              : (used >= G && b != last);
        if (blocked) {
          tile(first, last, used, cur);
          cur = 0;
        }
      }
      if (cur == 0) {
        first = b;
        used = 0;
      }
      if (b != last || used == 0) used++;
      last = b;
      int64_t take = std::min(T - cur, c);
      cur += take;
      c -= take;
      if (cur == T) {
        tile(first, last, used, cur);
        cur = 0;
        last = -1;  // a continuation re-counts the block
      }
    }
  }
  if (cur > 0) tile(first, last, used, cur);
}

inline int64_t span_of(int32_t first, int32_t last, int64_t used,
                       bool contig) {
  return contig ? (static_cast<int64_t>(last) - first + 1) : used;
}

}  // namespace

extern "C" {

// Tuner: per-candidate tile count / span-sum / pow2 span histogram
// (8 buckets: ceil(log2(span)) clamped to [0,7]) / max span.
void block_tiles_plan(int64_t M, int64_t N, int64_t nnz,
                      const int64_t* ro, const int32_t* ci, int64_t T,
                      int32_t ncand, const int64_t* wrs,
                      const int64_t* gs, const int32_t* contigs,
                      int64_t* out_ntiles, int64_t* out_span_sum,
                      int64_t* out_hist, int64_t* out_span_max) {
  int64_t nbc = N / kLanes + 1;
  (void)nnz;
#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<int32_t> cnt(static_cast<size_t>(nbc), 0);
    std::vector<int32_t> blocks;
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int32_t j = 0; j < ncand; j++) {
      int64_t Wr = wrs[j], G = gs[j];
      bool contig = contigs[j] != 0;
      int64_t ntiles = 0, span_sum = 0, span_max = 0;
      int64_t hist[8] = {0};
      for (int64_t row_lo = 0; row_lo < M; row_lo += Wr) {
        int64_t row_hi = std::min(row_lo + Wr, M);
        if (ro[row_hi] == ro[row_lo]) continue;
        scan_window(ro, ci, row_lo, row_hi, cnt.data(), &blocks);
        greedy_walk(blocks, cnt.data(), T, G, contig,
                    [&](int32_t f, int32_t l, int64_t u, int64_t) {
                      int64_t sp = span_of(f, l, u, contig);
                      ntiles++;
                      span_sum += sp;
                      span_max = std::max(span_max, sp);
                      int b = 0;
                      while ((1 << b) < sp && b < 7) b++;
                      hist[b]++;
                    });
        for (int32_t b : blocks) cnt[b] = 0;
      }
      out_ntiles[j] = ntiles;
      out_span_sum[j] = span_sum;
      out_span_max[j] = span_max;
      for (int b = 0; b < 8; b++) out_hist[j * 8 + b] = hist[b];
    }
  }
}

// Tile count for one candidate; *out_span_max gets the max col span.
int64_t block_tiles_count(int64_t M, int64_t N, int64_t nnz,
                          const int64_t* ro, const int32_t* ci,
                          int64_t T, int64_t Wr, int64_t G,
                          int32_t contig, int64_t* out_span_max) {
  int64_t ntiles, span_sum, hist[8], span_max;
  int32_t c = contig;
  block_tiles_plan(M, N, nnz, ro, ci, T, 1, &Wr, &G, &c, &ntiles,
                   &span_sum, hist, &span_max);
  if (out_span_max) *out_span_max = span_max;
  return ntiles;
}

// Fill caller-allocated payloads (layout parity with the numpy
// builder; vals_t/lcols_t zero-initialized, epos_t filled with -1,
// blk_list zero-initialized (ntiles, Gmax) or null for contig mode).
// Returns 0, or -1 when the tile count disagrees with ntiles.
int32_t block_tiles_fill(int64_t M, int64_t N, int64_t nnz,
                         const int64_t* ro, const int32_t* ci,
                         const void* vals, int32_t elsize, int64_t T,
                         int64_t Wr, int64_t G, int32_t contig_i,
                         int64_t ntiles, int64_t Gmax, void* vals_t,
                         int32_t* lcols_t, int32_t* epos_t,
                         int32_t* rblk, int32_t* cblk, int32_t* cspan,
                         int32_t* blk_list) {
  bool contig = contig_i != 0;
  int64_t nbc = N / kLanes + 1;
  const char* vsrc = static_cast<const char*>(vals);
  char* vdst = static_cast<char*>(vals_t);
  (void)nnz;

  // per-window first-tile offsets so windows fill independently
  int64_t nwin = (M + Wr - 1) / Wr;
  std::vector<int64_t> win_tile_base(static_cast<size_t>(nwin) + 1, 0);
  {
    std::vector<int32_t> cnt(static_cast<size_t>(nbc), 0);
    std::vector<int32_t> blocks;
    for (int64_t w = 0; w < nwin; w++) {
      int64_t row_lo = w * Wr, row_hi = std::min(row_lo + Wr, M);
      int64_t t = 0;
      if (ro[row_hi] > ro[row_lo]) {
        scan_window(ro, ci, row_lo, row_hi, cnt.data(), &blocks);
        greedy_walk(blocks, cnt.data(), T, G, contig,
                    [&](int32_t, int32_t, int64_t, int64_t) { t++; });
        for (int32_t b : blocks) cnt[b] = 0;
      }
      win_tile_base[static_cast<size_t>(w) + 1] =
          win_tile_base[static_cast<size_t>(w)] + t;
    }
  }
  if (win_tile_base[static_cast<size_t>(nwin)] != ntiles) return -1;

#ifdef _OPENMP
#pragma omp parallel
#endif
  {
    std::vector<int32_t> cnt(static_cast<size_t>(nbc), 0);
    std::vector<int32_t> blocks;
    // per-window scratch, sized on demand
    std::vector<int64_t> cut_pos;     // per-tile start position
    std::vector<int64_t> blk_base;    // per-block exclusive prefix
    std::vector<int64_t> rowbase;     // per-(tile, lrow) slot cursors
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
    for (int64_t w = 0; w < nwin; w++) {
      int64_t row_lo = w * Wr, row_hi = std::min(row_lo + Wr, M);
      if (ro[row_hi] == ro[row_lo]) continue;
      scan_window(ro, ci, row_lo, row_hi, cnt.data(), &blocks);
      int64_t t0 = win_tile_base[static_cast<size_t>(w)];

      // greedy walk -> per-tile meta + cut positions + blk lists
      cut_pos.clear();
      int64_t pos_acc = 0;
      {
        int64_t t = t0;
        greedy_walk(blocks, cnt.data(), T, G, contig,
                    [&](int32_t f, int32_t l, int64_t u, int64_t c) {
                      cut_pos.push_back(pos_acc);
                      pos_acc += c;
                      rblk[t] = static_cast<int32_t>(
                          (row_lo / kLanes));
                      cblk[t] = f;
                      cspan[t] = static_cast<int32_t>(
                          span_of(f, l, u, contig));
                      t++;
                    });
      }
      int64_t ntw = static_cast<int64_t>(cut_pos.size());

      // block-sorted position of each entry: exclusive prefix of
      // per-block counts (ascending touched blocks)
      blk_base.assign(blocks.size() + 1, 0);
      for (size_t i = 0; i < blocks.size(); i++)
        blk_base[i + 1] = blk_base[i] + cnt[blocks[i]];
      // map block id -> dense index via cnt reuse (cnt holds counts;
      // we need a lookup: store dense index in a second scratch that
      // reuses cnt after copying counts into blk_base above)
      for (size_t i = 0; i < blocks.size(); i++)
        cnt[blocks[i]] = static_cast<int32_t>(i);

      // blk lists per tile (list mode): ascending touched blocks
      // within the tile's position range
      if (!contig && blk_list) {
        for (int64_t t = 0; t < ntw; t++) {
          int64_t lo = cut_pos[static_cast<size_t>(t)];
          int64_t hi = (t + 1 < ntw) ? cut_pos[static_cast<size_t>(t) + 1]
                                     : pos_acc;
          // first block covering position lo
          size_t bi = static_cast<size_t>(
              std::upper_bound(blk_base.begin(), blk_base.end(), lo) -
              blk_base.begin()) - 1;
          int32_t k = 0;
          while (bi < blocks.size() && blk_base[bi] < hi) {
            blk_list[(t0 + t) * Gmax + k] = blocks[bi];
            k++;
            bi++;
          }
        }
      }

      // per-(tile, lrow) slot bases: count, then exclusive prefix
      rowbase.assign(static_cast<size_t>(ntw) * Wr, 0);
      for (int64_t r = row_lo; r < row_hi; r++) {
        for (int64_t e = ro[r]; e < ro[r + 1]; e++) {
          int64_t bi = cnt[ci[e] / kLanes];
          int64_t pos = blk_base[static_cast<size_t>(bi)]++;
          // tile of this position
          int64_t t = static_cast<int64_t>(
              std::upper_bound(cut_pos.begin(), cut_pos.end(), pos) -
              cut_pos.begin()) - 1;
          rowbase[static_cast<size_t>(t) * Wr + (r - row_lo)]++;
        }
      }
      // undo the blk_base cursor bumps (restore exclusive prefix)
      for (size_t i = blocks.size(); i > 0; i--)
        blk_base[i] = blk_base[i - 1];
      blk_base[0] = 0;
      {
        int64_t run = 0;
        for (int64_t t = 0; t < ntw; t++) {
          run = 0;
          int64_t* rb = rowbase.data() + t * Wr;
          for (int64_t rr = 0; rr < Wr; rr++) {
            int64_t c = rb[rr];
            rb[rr] = run;
            run += c;
          }
        }
      }

      // final scatter: slot = rowbase cursor (stable -> (row, col))
      for (int64_t r = row_lo; r < row_hi; r++) {
        int64_t lr = r - row_lo;
        for (int64_t e = ro[r]; e < ro[r + 1]; e++) {
          int64_t bidx = cnt[ci[e] / kLanes];
          int64_t pos = blk_base[static_cast<size_t>(bidx)]++;
          int64_t tw = static_cast<int64_t>(
              std::upper_bound(cut_pos.begin(), cut_pos.end(), pos) -
              cut_pos.begin()) - 1;
          int64_t t = t0 + tw;
          int64_t s = rowbase[static_cast<size_t>(tw) * Wr + lr]++;
          std::memcpy(vdst + (t * T + s) * elsize, vsrc + e * elsize,
                      static_cast<size_t>(elsize));
          int32_t lc;
          if (contig) {
            lc = static_cast<int32_t>(ci[e] - cblk[t] * kLanes);
          } else {
            // rank of the entry's block within the tile's list
            const int32_t* bl = blk_list + t * Gmax;
            int32_t cb = ci[e] / kLanes;
            int32_t k = static_cast<int32_t>(
                std::lower_bound(bl, bl + cspan[t], cb) - bl);
            lc = static_cast<int32_t>(k * kLanes + ci[e] % kLanes);
          }
          lcols_t[t * T + s] = lc;
          epos_t[t * Wr + lr] =
              std::max(epos_t[t * Wr + lr], static_cast<int32_t>(s));
        }
      }

      for (int32_t b : blocks) cnt[b] = 0;
    }
  }

  // running-max end positions (same post-pass as merge_tiles_fill)
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t t = 0; t < ntiles; t++) {
    int32_t* ep = epos_t + t * Wr;
    int32_t run = -1;
    for (int64_t rr = 0; rr < Wr; rr++) {
      run = std::max(run, ep[rr]);
      ep[rr] = run;
    }
  }
  return 0;
}

}  // extern "C"
