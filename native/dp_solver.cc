// Minimal-spread smooth-path solver (C++ core).
//
// Native implementation of the dynamic-selection subsequence search
// (reference prior.py:223-297: find_minimal_spread_and_path /
// is_path_possible). The Python reference is O(|W| * n * m^2) per binary-
// search probe with heavy interpreter overhead; exploration sweeps call it
// with m up to the exploration budget, so it is the hottest host-side loop
// in the dynamic-selection pipeline. Exposed to Python via ctypes
// (aid_tpu/native/__init__.py).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <set>
#include <vector>

namespace {

struct State {
  double max_w;
  double min_w;
  int32_t prev;      // predecessor node
  int32_t prev_len;  // path length at predecessor
  bool valid;
};

// DP feasibility check: is there an n-node increasing path 0 -> m-1 whose
// edge weights all lie in some window [w_min, w_min + D]?
// Returns the path (length n) in `path_out`, or false.
bool is_path_possible(double D, int n, int m, const double* w,
                      const std::vector<double>& W, int32_t* path_out) {
  std::vector<State> dp(static_cast<size_t>(m) * (n + 1));
  for (double w_min : W) {
    const double w_max = w_min + D;
    if (w_max > W.back() + 1e-15) break;

    std::fill(dp.begin(), dp.end(), State{0, 0, -1, -1, false});
    auto at = [&](int i, int l) -> State& { return dp[static_cast<size_t>(i) * (n + 1) + l]; };
    at(0, 1) = {-std::numeric_limits<double>::infinity(),
                std::numeric_limits<double>::infinity(), -1, -1, true};

    for (int l = 1; l < n; ++l) {
      for (int i = 0; i < m; ++i) {
        State& cur = at(i, l);
        if (!cur.valid) continue;
        for (int j = i + 1; j < m; ++j) {
          const double wij = w[static_cast<size_t>(i) * m + j];
          if (wij == -1.0 || wij < w_min || wij > w_max) continue;
          const double nmax = std::max(cur.max_w, wij);
          const double nmin = std::min(cur.min_w, wij);
          if (nmax - nmin > D) continue;
          State& nxt = at(j, l + 1);
          if (!nxt.valid || (nmax - nmin) < (nxt.max_w - nxt.min_w)) {
            nxt = {nmax, nmin, i, l, true};
          }
        }
      }
    }

    if (at(m - 1, n).valid) {
      int i = m - 1, l = n;
      for (int pos = n - 1; pos >= 0; --pos) {
        path_out[pos] = i;
        const State& s = at(i, l);
        i = s.prev;
        l = s.prev_len;
      }
      return true;
    }
  }
  return false;
}

}  // namespace

extern "C" {

// weights: row-major (m, m), -1 marks absent edges (j <= i).
// path_out: int32[n]. Returns the minimal spread D, or -1 if no path.
double find_minimal_spread_and_path(int n, int m, const double* weights,
                                    int32_t* path_out) {
  std::set<double> wset;
  for (int i = 0; i < m - 1; ++i)
    for (int j = i + 1; j < m; ++j)
      if (weights[static_cast<size_t>(i) * m + j] != -1.0)
        wset.insert(weights[static_cast<size_t>(i) * m + j]);
  if (wset.empty()) return -1.0;
  std::vector<double> W(wset.begin(), wset.end());

  double low = 0.0, high = W.back() - W.front();
  const double eps = 1e-6;
  double best_D = -1.0;
  std::vector<int32_t> tmp(n), best(n);
  while (high - low > eps) {
    const double D = (low + high) / 2.0;
    if (is_path_possible(D, n, m, weights, W, tmp.data())) {
      high = D;
      best_D = D;
      best = tmp;
    } else {
      low = D;
    }
  }
  if (best_D < 0) {
    // The bisection never probes D == high, so instances whose minimal
    // feasible spread equals the full weight range (incl. all-equal
    // weights, where high == 0 and the loop is skipped) need one probe at
    // the bound itself (fixes the reference's (None, None) crash path).
    if (is_path_possible(high, n, m, weights, W, tmp.data())) {
      best_D = high;
      best = tmp;
    }
  }
  if (best_D < 0) return -1.0;
  std::copy(best.begin(), best.end(), path_out);
  return best_D;
}

}  // extern "C"
