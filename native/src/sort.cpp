// Parallel argsort over packed 64-bit keys — the host partitioners'
// hot path (formats/tiles.py and formats/ell.py pack their multi-key
// lexicographic orders into one uint64 per entry; see the Python side
// for the bit layouts). Replaces numpy's single-threaded lexsort.
//
// Implementation: OpenMP-parallel MSB radix partition (8-bit digits)
// over (key, index) pairs, falling back to std::sort per bucket.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct KV {
  uint64_t k;
  int64_t v;
};

}  // namespace

extern "C" {

// keys: n packed uint64; out: n int64 indices such that keys[out] is
// ascending (not stable — callers pack full disambiguation into the
// key when order within equal keys matters).
void argsort_u64(int64_t n, const uint64_t* keys, int64_t* out) {
  std::vector<KV> kv(static_cast<size_t>(n));
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; i++) {
    kv[static_cast<size_t>(i)] = {keys[i], i};
  }

  // Top-level 8-bit radix split on the highest *varying* byte, then
  // per-bucket std::sort in parallel.
  uint64_t mn = ~0ULL, mx = 0;
#ifdef _OPENMP
#pragma omp parallel for reduction(min : mn) reduction(max : mx)
#endif
  for (int64_t i = 0; i < n; i++) {
    mn = std::min(mn, keys[i]);
    mx = std::max(mx, keys[i]);
  }
  uint64_t diff = mn ^ mx;
  int shift = 0;
  for (int b = 56; b >= 0; b -= 8) {
    if ((diff >> b) & 0xFF) {
      shift = b;
      break;
    }
  }

  const int kBuckets = 256;
  std::vector<int64_t> counts(kBuckets + 1, 0);
  for (int64_t i = 0; i < n; i++) {
    counts[((keys[i] >> shift) & 0xFF) + 1]++;
  }
  for (int b = 0; b < kBuckets; b++) counts[b + 1] += counts[b];

  std::vector<KV> sorted(static_cast<size_t>(n));
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t i = 0; i < n; i++) {
    int b = (kv[static_cast<size_t>(i)].k >> shift) & 0xFF;
    sorted[static_cast<size_t>(cursor[b]++)] = kv[static_cast<size_t>(i)];
  }

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int b = 0; b < kBuckets; b++) {
    std::sort(sorted.begin() + counts[b], sorted.begin() + counts[b + 1],
              [](const KV& a, const KV& c) { return a.k < c.k; });
  }

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; i++) {
    out[i] = sorted[static_cast<size_t>(i)].v;
  }
}

}  // extern "C"
