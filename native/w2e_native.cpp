// Native host-side runtime pieces for where2edit_tpu.
//
// The reference is pure Python; its host-side hot spots are the phase-1
// k-means fit (sklearn, single-threaded, over an (N·H·W, 576) matrix —
// attention/clustering_feature.py:389-394) and BPE text tokenization on the
// serving path. This library provides multithreaded C++ implementations,
// exposed through a C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libw2e_native.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <random>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

// Parallel-for over [0, n) in contiguous chunks.
template <typename F>
void parallel_for(int64_t n, F&& fn) {
  int nthreads = std::min<int64_t>(hardware_threads(), n);
  if (nthreads <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min<int64_t>(lo + chunk, n);
    if (lo >= hi) break;
    threads.emplace_back([lo, hi, &fn] { fn(lo, hi); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Lloyd k-means with k-means++ seeding. data: (n, d) row-major float32.
// centers_out: (k, d). assignments_out (optional, may be null): (n,) int32.
// Returns the number of iterations actually run (early-stops when
// assignments stabilize).
int w2e_kmeans_fit(const float* data, int64_t n, int32_t d, int32_t k,
                   int32_t max_iters, uint64_t seed, float* centers_out,
                   int32_t* assignments_out) {
  if (n < k || k <= 0 || d <= 0) return -1;
  std::mt19937_64 rng(seed);

  std::vector<float> centers(static_cast<size_t>(k) * d);
  std::vector<float> min_dist(n, std::numeric_limits<float>::max());

  // k-means++ seeding
  {
    std::uniform_int_distribution<int64_t> uni(0, n - 1);
    int64_t first = uni(rng);
    std::memcpy(centers.data(), data + first * d, sizeof(float) * d);
    for (int c = 1; c < k; ++c) {
      const float* prev = centers.data() + static_cast<size_t>(c - 1) * d;
      parallel_for(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
          const float* row = data + i * d;
          float acc = 0.f;
          for (int j = 0; j < d; ++j) {
            float diff = row[j] - prev[j];
            acc += diff * diff;
          }
          min_dist[i] = std::min(min_dist[i], acc);
        }
      });
      double total = 0;
      for (int64_t i = 0; i < n; ++i) total += min_dist[i];
      std::uniform_real_distribution<double> ureal(0, total);
      double target = ureal(rng);
      int64_t chosen = n - 1;
      double acc = 0;
      for (int64_t i = 0; i < n; ++i) {
        acc += min_dist[i];
        if (acc >= target) { chosen = i; break; }
      }
      std::memcpy(centers.data() + static_cast<size_t>(c) * d,
                  data + chosen * d, sizeof(float) * d);
    }
  }

  std::vector<int32_t> assign(n, -1);
  int nthreads = hardware_threads();
  std::vector<double> sums(static_cast<size_t>(nthreads) * k * d);
  std::vector<int64_t> counts(static_cast<size_t>(nthreads) * k);

  int iter = 0;
  for (; iter < max_iters; ++iter) {
    std::fill(sums.begin(), sums.end(), 0.0);
    std::fill(counts.begin(), counts.end(), 0);
    std::atomic<int64_t> changed{0};

    // assignment + per-thread partial sums
    int64_t chunk = (n + nthreads - 1) / nthreads;
    std::vector<std::thread> threads;
    for (int t = 0; t < nthreads; ++t) {
      int64_t lo = t * chunk, hi = std::min<int64_t>(lo + chunk, n);
      if (lo >= hi) break;
      threads.emplace_back([&, t, lo, hi] {
        double* my_sums = sums.data() + static_cast<size_t>(t) * k * d;
        int64_t* my_counts = counts.data() + static_cast<size_t>(t) * k;
        int64_t my_changed = 0;
        for (int64_t i = lo; i < hi; ++i) {
          const float* row = data + i * d;
          float best = std::numeric_limits<float>::max();
          int32_t best_c = 0;
          for (int c = 0; c < k; ++c) {
            const float* cen = centers.data() + static_cast<size_t>(c) * d;
            float acc = 0.f;
            for (int j = 0; j < d; ++j) {
              float diff = row[j] - cen[j];
              acc += diff * diff;
            }
            if (acc < best) { best = acc; best_c = c; }
          }
          if (assign[i] != best_c) { assign[i] = best_c; ++my_changed; }
          double* s = my_sums + static_cast<size_t>(best_c) * d;
          for (int j = 0; j < d; ++j) s[j] += row[j];
          ++my_counts[best_c];
        }
        changed += my_changed;
      });
    }
    for (auto& th : threads) th.join();

    // reduce + update
    for (int c = 0; c < k; ++c) {
      int64_t count = 0;
      for (int t = 0; t < nthreads; ++t)
        count += counts[static_cast<size_t>(t) * k + c];
      if (count == 0) continue;  // keep empty-cluster center in place
      float* cen = centers.data() + static_cast<size_t>(c) * d;
      for (int j = 0; j < d; ++j) {
        double s = 0;
        for (int t = 0; t < nthreads; ++t)
          s += sums[(static_cast<size_t>(t) * k + c) * d + j];
        cen[j] = static_cast<float>(s / count);
      }
    }
    if (changed.load() == 0) { ++iter; break; }
  }

  std::memcpy(centers_out, centers.data(), sizeof(float) * k * d);
  if (assignments_out)
    std::memcpy(assignments_out, assign.data(), sizeof(int32_t) * n);
  return iter;
}

// Nearest-center assignment: ids_out (n,) int32.
void w2e_kmeans_assign(const float* data, int64_t n, int32_t d,
                       const float* centers, int32_t k, int32_t* ids_out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const float* row = data + i * d;
      float best = std::numeric_limits<float>::max();
      int32_t best_c = 0;
      for (int c = 0; c < k; ++c) {
        const float* cen = centers + static_cast<size_t>(c) * d;
        float acc = 0.f;
        for (int j = 0; j < d; ++j) {
          float diff = row[j] - cen[j];
          acc += diff * diff;
        }
        if (acc < best) { best = acc; best_c = c; }
      }
      ids_out[i] = best_c;
    }
  });
}

}  // extern "C"
