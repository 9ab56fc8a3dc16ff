// Exact DTW (dynamic time warping) path extraction as a C ABI for ctypes.
//
// The evaluator aligns predicted-duration synthesis against ground truth with
// DTW over mel-cepstra (emotts/eval/metrics.py).  The reference has no
// objective evaluation at all (SURVEY.md §4); this framework does, and a
// full-corpus eval runs DTW over thousands of utterance pairs, so the O(T1*T2)
// dynamic program lives here in C++ (the pure-numpy anti-diagonal sweep in
// metrics.py is the fallback).
//
// Semantics match emotts.eval.metrics.dtw_path exactly: accumulation
//   acc[i,j] = cost[i-1,j-1] + min(acc[i-1,j-1], acc[i-1,j], acc[i,j-1])
// with acc[0,0]=0 and an inf border, then greedy backtrack from (t1,t2)
// preferring diagonal on ties (np.argmin picks the first minimum, and the
// move tuple is ordered (diag, up, left)).

#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

namespace {
constexpr double kInf = std::numeric_limits<double>::infinity();
}

extern "C" {

// cost: row-major (t1, t2) float64.  path_i/path_j: output buffers of
// capacity max_path (>= t1 + t2 is always enough).  Returns the path length,
// or -1 on bad arguments / insufficient buffer.
int64_t emotts_dtw_path(const double* cost, int64_t t1, int64_t t2,
                        int32_t* path_i, int32_t* path_j, int64_t max_path) {
  if (t1 <= 0 || t2 <= 0 || max_path < 1) return -1;

  // Full accumulation matrix with the +1 border, matching the numpy mirror.
  // Utterance scale (T <= ~2000) => a few tens of MB at most.
  const int64_t w = t2 + 1;
  std::vector<double> acc(static_cast<size_t>(t1 + 1) * w, kInf);
  acc[0] = 0.0;
  for (int64_t i = 1; i <= t1; ++i) {
    const double* row_cost = cost + (i - 1) * t2;
    const double* prev = acc.data() + (i - 1) * w;
    double* cur = acc.data() + i * w;
    double left = cur[0];  // inf border
    for (int64_t j = 1; j <= t2; ++j) {
      double best = prev[j - 1];
      if (prev[j] < best) best = prev[j];
      if (left < best) best = left;
      left = row_cost[j - 1] + best;
      cur[j] = left;
    }
  }

  // Backtrack (greedy, diagonal-first on ties — np.argmin semantics).
  int64_t i = t1, j = t2, n = 0;
  std::vector<int32_t> pi, pj;
  pi.reserve(t1 + t2);
  pj.reserve(t1 + t2);
  while (i > 0 && j > 0) {
    pi.push_back(static_cast<int32_t>(i - 1));
    pj.push_back(static_cast<int32_t>(j - 1));
    const double diag = acc[(i - 1) * w + (j - 1)];
    const double up = acc[(i - 1) * w + j];
    const double left = acc[i * w + (j - 1)];
    if (diag <= up && diag <= left) {
      --i;
      --j;
    } else if (up <= left) {
      --i;
    } else {
      --j;
    }
    ++n;
  }
  if (n > max_path) return -1;
  for (int64_t k = 0; k < n; ++k) {  // reverse into output
    path_i[k] = pi[n - 1 - k];
    path_j[k] = pj[n - 1 - k];
  }
  return n;
}

}  // extern "C"
