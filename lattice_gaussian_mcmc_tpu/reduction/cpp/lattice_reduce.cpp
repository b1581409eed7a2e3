// Host-side lattice reduction: LLL (L2-style floating GSO over an exact
// integer Gram matrix) and BKZ with Schnorr-Euchner enumeration.
//
// This is the TPU build's native replacement for the reference's fplll
// dependency (reference src/lattices/reduction.py:103,275 calls Sage
// Matrix.LLL()/.BKZ()): reduction is inherently sequential exact-arithmetic
// work, so it stays on the host in C++ and the reduced basis is pushed to
// device HBM afterwards (SURVEY.md section 2.2).
//
// Exposed C ABI (ctypes):
//   int lll_reduce(int64_t* basis, int n, double delta);
//   int bkz_reduce(int64_t* basis, int n, int beta, double delta,
//                  int max_tours);
//   basis is row-major, n x n, rows are basis VECTORS. Returns 0 on success,
//   nonzero on numerical failure (caller falls back to Python).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;
using i128 = __int128;

struct Reducer {
  int n;
  std::vector<std::vector<i64>> b;       // basis rows
  std::vector<std::vector<i128>> G;      // exact Gram matrix
  std::vector<std::vector<double>> mu;   // GSO coefficients
  std::vector<std::vector<double>> r;    // r[i][j] = <b_i, b*_j>
  int valid;                             // rows [0, valid) of mu/r are fresh

  explicit Reducer(i64* basis, int n_) : n(n_) {
    b.assign(n, std::vector<i64>(n));
    for (int i = 0; i < n; i++)
      for (int j = 0; j < n; j++) b[i][j] = basis[i * n + j];
    G.assign(n, std::vector<i128>(n));
    for (int i = 0; i < n; i++)
      for (int j = 0; j <= i; j++) {
        i128 s = 0;
        for (int k = 0; k < n; k++) s += (i128)b[i][k] * b[j][k];
        G[i][j] = G[j][i] = s;
      }
    mu.assign(n, std::vector<double>(n, 0.0));
    r.assign(n, std::vector<double>(n, 0.0));
    valid = 0;
  }

  // Recompute GSO row i from the exact Gram matrix (rows < i must be valid).
  void compute_row(int i) {
    for (int j = 0; j <= i; j++) {
      double rij = (double)G[i][j];
      for (int l = 0; l < j; l++) rij -= mu[j][l] * r[i][l];
      r[i][j] = rij;
      if (j < i) mu[i][j] = r[j][j] != 0.0 ? rij / r[j][j] : 0.0;
    }
    mu[i][i] = 1.0;
  }

  void ensure(int upto) {  // make rows [0, upto] valid
    for (int i = valid; i <= upto; i++) compute_row(i);
    if (upto >= valid) valid = upto + 1;
  }

  // b_i -= c * b_j, exact Gram update. O(n).
  void addmul(int i, int j, i64 c) {
    if (c == 0) return;
    for (int k = 0; k < n; k++) b[i][k] -= c * b[j][k];
    // G row/col i update: G[i][l] -= c G[j][l]; G[i][i] handled via formula
    i128 c128 = (i128)c;
    i128 gii = G[i][i] - 2 * c128 * G[i][j] + c128 * c128 * G[j][j];
    for (int l = 0; l < n; l++) {
      if (l == i) continue;
      G[i][l] -= c128 * G[j][l];
      G[l][i] = G[i][l];
    }
    G[i][i] = gii;
  }

  void swap_rows(int i, int j) {
    std::swap(b[i], b[j]);
    std::swap(G[i], G[j]);
    for (int l = 0; l < n; l++) std::swap(G[l][i], G[l][j]);
  }

  // Size-reduce row k against rows j < k. Returns false on FP trouble.
  bool size_reduce(int k) {
    const double eta = 0.51;
    for (int iter = 0; iter < 64; iter++) {
      ensure(k);
      bool any = false;
      for (int j = k - 1; j >= 0; j--) {
        double m = mu[k][j];
        if (std::fabs(m) > eta) {
          double rm = std::nearbyint(m);
          if (std::fabs(rm) > 9.0e18) return false;  // would overflow i64
          addmul(k, j, (i64)rm);
          any = true;
        }
      }
      if (!any) return true;
      valid = k;  // row k stale after basis change
    }
    return true;  // eta-reduction may cycle at FP precision limits; accept
  }

  int lll(double delta) {
    ensure(0);
    int k = 1;
    long long guard = 0, guard_max = 4LL * n * n * n + 200000;
    while (k < n) {
      if (++guard > guard_max) return 1;
      if (!size_reduce(k)) return 2;
      ensure(k);
      double lhs = delta * r[k - 1][k - 1];
      double rhs = r[k][k] + mu[k][k - 1] * mu[k][k - 1] * r[k - 1][k - 1];
      if (lhs <= rhs) {
        k++;
      } else {
        swap_rows(k, k - 1);
        valid = (k - 1 < valid) ? k - 1 : valid;
        k = k > 1 ? k - 1 : 1;
      }
    }
    return 0;
  }

  double gs_norm2(int i) {
    ensure(i);
    return r[i][i];
  }
};

// Cleaner recursive SE enumeration (depth-first with explicit stack-free
// zig-zag) — replaces the fiddly loop above for correctness.
struct Enumerator {
  int m, j0;
  const std::vector<std::vector<double>>& mu;
  const std::vector<std::vector<double>>& r;
  std::vector<double> x, c, partdist, step;
  std::vector<double> best;
  std::vector<double> prune;  // per-level bound fraction (linear pruning)
  double R;
  bool found = false;
  long long budget;

  Enumerator(int j0_, int m_, double bound,
             const std::vector<std::vector<double>>& mu_,
             const std::vector<std::vector<double>>& r_, long long budget_,
             bool use_pruning = false)
      : m(m_), j0(j0_), mu(mu_), r(r_), x(m_, 0), c(m_, 0),
        partdist(m_ + 1, 0), step(m_, 0), best(m_, 0), prune(m_ + 1, 1.0),
        R(bound), budget(budget_) {
    if (use_pruning) {
      // linear pruning (Schnorr-Horner): at depth k from the leaves the
      // partial distance may use only ~((m - k)/m) of the bound
      for (int k = 0; k <= m; k++)
        prune[k] = std::max(0.3, (double)(m - k + 1) / m);
    }
  }

  void center(int k) {
    double s = 0;
    for (int t = k + 1; t < m; t++) s += x[t] * mu[j0 + t][j0 + k];
    c[k] = -s;
  }

  // next candidate for x[k] in zig-zag order: c, c+1, c-1, c+2, c-2, ...
  void first(int k) {
    center(k);
    x[k] = std::nearbyint(c[k]);
    step[k] = 0;
  }
  void next(int k) {
    double s = step[k];
    s = (s <= 0) ? -s + 1 : -s;
    step[k] = s;
    x[k] = std::nearbyint(c[k]) + s;
  }

  void run() {
    int k = m - 1;
    first(k);
    while (true) {
      if (--budget < 0) return;
      double yk = x[k] - c[k];
      double dist = partdist[k + 1] + yk * yk * r[j0 + k][j0 + k];
      if (dist < R * prune[k] * (1.0 - 1e-12)) {
        if (k == 0) {
          bool nonzero = false;
          for (int t = 0; t < m; t++)
            if (std::fabs(x[t]) > 0.5) { nonzero = true; break; }
          if (nonzero) { R = dist; best = x; found = true; }
          next(k);
        } else {
          partdist[k] = dist;
          k--;
          first(k);
        }
      } else {
        k++;
        if (k >= m) return;
        next(k);
      }
    }
  }
};

}  // namespace

extern "C" {

int lll_reduce(i64* basis, int n, double delta) {
  Reducer red(basis, n);
  int rc = red.lll(delta);
  if (rc == 0)
    for (int i = 0; i < n; i++)
      for (int j = 0; j < n; j++) basis[i * n + j] = red.b[i][j];
  return rc;
}

// One BKZ tour applies enumeration to each block and inserts improvements.
int bkz_reduce(i64* basis, int n, int beta, double delta, int max_tours) {
  Reducer red(basis, n);
  int rc = red.lll(delta);
  if (rc != 0) return rc;
  if (beta < 2) beta = 2;

  for (int tour = 0; tour < max_tours; tour++) {
    bool improved = false;
    for (int j = 0; j < n - 1; j++) {
      int kend = j + beta - 1 < n - 1 ? j + beta - 1 : n - 1;
      int m = kend - j + 1;
      if (m < 2) continue;
      red.ensure(kend);
      double bound = red.r[j][j];
      // linear pruning for large blocks (finds slightly fewer vectors per
      // tour but explores orders of magnitude fewer nodes at beta >= 25)
      Enumerator en(j, m, bound * (1.0 - 1e-9), red.mu, red.r, 20000000,
                    beta >= 25);
      en.run();
      if (en.found) {
        // insert sum_t x[t] b_{j+t} at position j: build the vector, append
        // via "insertion by lifting": place combined vector at row j by
        // integer row ops. Simple approach: create the new vector, put it in
        // a temporary (n+1)-row basis and LLL the window — here we do the
        // classic trick: push combination into row j via sequential addmul
        // on a copy, then re-LLL. For simplicity and robustness: extend
        // basis with the new vector at j and run LLL to remove the linear
        // dependency. We emulate by applying unimodular ops when the last
        // nonzero coefficient is +-1; otherwise skip insertion.
        int last = -1;
        for (int t = m - 1; t >= 0; t--)
          if (std::fabs(en.best[t]) > 0.5) { last = t; break; }
        if (last >= 0 &&
            std::fabs(std::fabs(en.best[last]) - 1.0) < 1e-9) {
          int row = j + last;
          // b_row <- sum_t x[t] b_{j+t}  (unimodular since x[last] = +-1)
          if (en.best[last] < 0)
            for (int kk = 0; kk < n; kk++) red.b[row][kk] = -red.b[row][kk];
          // Gram update for negation: G row/col sign flip
          if (en.best[last] < 0) {
            for (int l = 0; l < n; l++) {
              red.G[row][l] = -red.G[row][l];
              red.G[l][row] = red.G[row][l];
            }
            red.G[row][row] = -red.G[row][row];  // flipped twice -> restore
          }
          for (int t = 0; t < last; t++) {
            double xt = en.best[t] * (en.best[last] < 0 ? -1.0 : 1.0);
            // b_row += xt * b_{j+t}  ==  addmul(row, j+t, -xt)
            if (std::fabs(xt) > 0.5)
              red.addmul(row, j + t, (i64)std::nearbyint(-xt));
          }
          // move row into position j
          for (int t = row; t > j; t--) red.swap_rows(t, t - 1);
          red.valid = j < red.valid ? j : red.valid;
          rc = red.lll(delta);
          if (rc != 0) return rc;
          improved = true;
        }
      }
    }
    if (!improved) break;
  }
  for (int i = 0; i < n; i++)
    for (int j = 0; j < n; j++) basis[i * n + j] = red.b[i][j];
  return 0;
}

// Gram-Schmidt profile of an integer basis (squared norms), for analytics.
int gso_profile(i64* basis, int n, double* out_norm2) {
  Reducer red(basis, n);
  for (int i = 0; i < n; i++) out_norm2[i] = red.gs_norm2(i);
  return 0;
}

}  // extern "C"
