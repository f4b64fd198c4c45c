// Native CPU geometric-multigrid Poisson solver (C ABI).
//
// The C++ rebuild of the reference's raw-pointer CPU variant
// (cpu-raw.lua: flat row-major buffers, free-function kernels driven by
// generic loop drivers, pre-allocated per-level hierarchy,
// cpu-raw.lua:8-114,142-174).  It exists for the same reason the
// reference's did: a hardware-native host-side implementation that the
// accelerator path can be differentially tested and benchmarked
// against (cpu-raw.lua:120 "output all data in a way that I can
// compare it with the cpu versions").
//
// Semantics match mgpoisson/oracle.py exactly:
//   - 5-point Laplacian, zero-ghost Dirichlet (bc=0) or face-Dirichlet
//     ghost = -edge (bc=1)
//   - Jacobi (out-of-place) / red-black Gauss-Seidel sweeps
//   - residual r = f - (askew + adiag*u)
//   - 2x2 average restriction, constant or face-bilinear prolongation
//   - V-cycle with single-sweep coarsest solve (exact at 1x1)
//   - RMS-of-update convergence (cpu.lua:203) with non-finite bail
//
// Build: make -C csrc   (produces libmgpoisson_cpu.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int BC_GHOST0 = 0;
constexpr int BC_FACE = 1;
constexpr int SMOOTH_JACOBI = 0;
constexpr int SMOOTH_RBGS = 1;
constexpr int SMOOTH_WJACOBI = 2;
constexpr int SCHEME_REFERENCE = 0;
constexpr int SCHEME_TUNED = 1;

inline double nbr_sum(const double* u, int n, int i, int j, int bc) {
  double up = i > 0 ? u[(i - 1) * n + j] : (bc == BC_FACE ? -u[i * n + j] : 0.0);
  double dn = i < n - 1 ? u[(i + 1) * n + j] : (bc == BC_FACE ? -u[i * n + j] : 0.0);
  double lf = j > 0 ? u[i * n + j - 1] : (bc == BC_FACE ? -u[i * n + j] : 0.0);
  double rt = j < n - 1 ? u[i * n + j + 1] : (bc == BC_FACE ? -u[i * n + j] : 0.0);
  return up + dn + lf + rt;
}

void jacobi_sweep(double* u, const double* f, double* tmp, int n, double h,
                  int bc) {
  const double hsq = h * h;
  const double adiag = -4.0 / hsq;
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      tmp[i * n + j] = (f[i * n + j] - nbr_sum(u, n, i, j, bc) / hsq) / adiag;
  std::memcpy(u, tmp, sizeof(double) * n * n);
}

void rbgs_sweep(double* u, const double* f, int n, double h, int bc) {
  const double hsq = h * h;
  const double adiag = -4.0 / hsq;
  for (int parity = 0; parity < 2; ++parity)
    for (int i = 0; i < n; ++i)
      for (int j = (i + parity) % 2; j < n; j += 2)
        u[i * n + j] = (f[i * n + j] - nbr_sum(u, n, i, j, bc) / hsq) / adiag;
}

void wjacobi_sweep(double* u, const double* f, double* tmp, int n, double h,
                   int bc) {
  // damped Jacobi, omega = 2d/(2d+1) = 4/5 in 2D
  const double omega = 0.8;
  const double hsq = h * h;
  const double adiag = -4.0 / hsq;
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) {
      const double jac =
          (f[i * n + j] - nbr_sum(u, n, i, j, bc) / hsq) / adiag;
      tmp[i * n + j] = u[i * n + j] + omega * (jac - u[i * n + j]);
    }
  std::memcpy(u, tmp, sizeof(double) * n * n);
}

void smooth(double* u, const double* f, double* tmp, int n, double h, int nu,
            int smoother, int bc) {
  for (int s = 0; s < nu; ++s) {
    if (smoother == SMOOTH_JACOBI)
      jacobi_sweep(u, f, tmp, n, h, bc);
    else if (smoother == SMOOTH_WJACOBI)
      wjacobi_sweep(u, f, tmp, n, h, bc);
    else if (smoother == SMOOTH_RBGS)
      rbgs_sweep(u, f, n, h, bc);
    // unknown ids are rejected at the ABI boundary (mg_abi_version
    // gate in the Python bindings + explicit dispatch here)
  }
}

void residual(const double* u, const double* f, double* r, int n, double h,
              int bc) {
  const double hsq = h * h;
  const double adiag = -4.0 / hsq;
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j)
      r[i * n + j] = f[i * n + j] -
                     (nbr_sum(u, n, i, j, bc) / hsq + adiag * u[i * n + j]);
}

void restrict_avg(const double* r, double* R, int n2) {
  const int n = 2 * n2;
  for (int I = 0; I < n2; ++I)
    for (int J = 0; J < n2; ++J)
      R[I * n2 + J] = 0.25 * (r[(2 * I) * n + 2 * J] + r[(2 * I + 1) * n + 2 * J] +
                              r[(2 * I) * n + 2 * J + 1] +
                              r[(2 * I + 1) * n + 2 * J + 1]);
}

void prolong_inject_add(double* u, const double* V, int n2) {
  const int n = 2 * n2;
  for (int I = 0; I < n2; ++I)
    for (int J = 0; J < n2; ++J) {
      const double v = V[I * n2 + J];
      u[(2 * I) * n + 2 * J] += v;
      u[(2 * I + 1) * n + 2 * J] += v;
      u[(2 * I) * n + 2 * J + 1] += v;
      u[(2 * I + 1) * n + 2 * J + 1] += v;
    }
}

// face-adapted bilinear 1D weights for fine index t in [0, 2m):
//   interior even  t=2I:   0.75 V[I] + 0.25 V[I-1]
//   interior odd   t=2I+1: 0.75 V[I] + 0.25 V[I+1]
//   t==0 or t==2m-1:       0.5 V[edge]
inline void bilin_w(int t, int m, int* c0, double* w0, int* c1, double* w1) {
  const int I = t / 2;
  if (t == 0 || t == 2 * m - 1) {
    *c0 = I; *w0 = 0.5; *c1 = I; *w1 = 0.0;
    return;
  }
  *c0 = I; *w0 = 0.75;
  *c1 = (t % 2 == 0) ? I - 1 : I + 1;
  *w1 = 0.25;
}

void prolong_bilinear_add(double* u, const double* V, int n2) {
  const int n = 2 * n2;
  for (int ti = 0; ti < n; ++ti) {
    int ia, ib; double wa, wb;
    bilin_w(ti, n2, &ia, &wa, &ib, &wb);
    for (int tj = 0; tj < n; ++tj) {
      int ja, jb; double va, vb;
      bilin_w(tj, n2, &ja, &va, &jb, &vb);
      double acc = wa * va * V[ia * n2 + ja];
      if (vb != 0.0) acc += wa * vb * V[ia * n2 + jb];
      if (wb != 0.0) {
        acc += wb * va * V[ib * n2 + ja];
        if (vb != 0.0) acc += wb * vb * V[ib * n2 + jb];
      }
      u[ti * n + tj] += acc;
    }
  }
}

struct Workspace {
  // per-level scratch keyed by side length (the reference pre-allocates
  // rs/Rs/vs/Vs[L], cpu-raw.lua:155-171)
  std::vector<std::vector<double>> bufs;
  double* get(size_t idx, size_t count) {
    if (bufs.size() <= idx) bufs.resize(idx + 1);
    if (bufs[idx].size() < count) bufs[idx].resize(count);
    return bufs[idx].data();
  }
};

void v_cycle(double* u, const double* f, int n, double h, int nu_pre,
             int nu_post, int smoother, int scheme, int coarse_size,
             bool fine_level, Workspace* ws, int depth) {
  const int bc = fine_level ? BC_GHOST0
                            : (scheme == SCHEME_TUNED ? BC_FACE : BC_GHOST0);
  double* tmp = ws->get(4 * depth + 0, (size_t)n * n);

  if (n <= coarse_size) {
    if (bc == BC_FACE && n == 1) {
      u[0] = f[0] * h * h / -8.0;  // exact 1x1 face-Dirichlet solve (2D)
      return;
    }
    smooth(u, f, tmp, n, h, 1, smoother, bc);
    return;
  }

  smooth(u, f, tmp, n, h, nu_pre, smoother, bc);

  double* r = ws->get(4 * depth + 1, (size_t)n * n);
  residual(u, f, r, n, h, bc);

  const int n2 = n / 2;
  double* R = ws->get(4 * depth + 2, (size_t)n2 * n2);
  restrict_avg(r, R, n2);

  double* V = ws->get(4 * depth + 3, (size_t)n2 * n2);
  std::memset(V, 0, sizeof(double) * n2 * n2);
  v_cycle(V, R, n2, 2 * h, nu_pre, nu_post, smoother, scheme, coarse_size,
          false, ws, depth + 1);

  if (scheme == SCHEME_TUNED)
    prolong_bilinear_add(u, V, n2);
  else
    prolong_inject_add(u, V, n2);

  smooth(u, f, tmp, n, h, nu_post, smoother, bc);
}

}  // namespace

extern "C" {

// bumped whenever the ABI or smoother/scheme id tables change; the
// Python bindings refuse to load a mismatched prebuilt library
int mg_abi_version(void) { return 2; }

void mg_point_charge_rhs(double* f, int n) {
  std::memset(f, 0, sizeof(double) * (size_t)n * n);
  f[(n / 2) * (size_t)n + n / 2] = -1.0e6;  // cpu-raw.lua:8-20
}

void mg_v_cycle(double* u, const double* f, int n, double h, int nu_pre,
                int nu_post, int smoother, int scheme, int coarse_size) {
  Workspace ws;
  v_cycle(u, f, n, h, nu_pre, nu_post, smoother, scheme, coarse_size, true,
          &ws, 0);
}

// Iterate V-cycles until RMS-of-update < tol or non-finite (cpu.lua:208-216).
// errs must hold maxiter doubles; returns the iteration count.
int mg_solve(double* psi, const double* f, int n, double h, double tol,
             int maxiter, int nu_pre, int nu_post, int smoother, int scheme,
             int coarse_size, double* errs) {
  const size_t count = (size_t)n * n;
  std::vector<double> psi_old(count);
  Workspace ws;
  int it = 0;
  while (it < maxiter) {
    std::memcpy(psi_old.data(), psi, sizeof(double) * count);
    v_cycle(psi, f, n, h, nu_pre, nu_post, smoother, scheme, coarse_size,
            true, &ws, 0);
    double acc = 0.0;
    for (size_t k = 0; k < count; ++k) {
      const double d = psi[k] - psi_old[k];
      acc += d * d;
    }
    const double err = std::sqrt(acc / (double)count);
    errs[it] = err;
    ++it;
    if (err < tol || !std::isfinite(err)) break;
  }
  return it;
}

double mg_residual_norm(const double* u, const double* f, int n, double h) {
  std::vector<double> r((size_t)n * n);
  residual(u, f, r.data(), n, h, BC_GHOST0);
  double acc = 0.0;
  for (double v : r) acc += v * v;
  return std::sqrt(acc);
}

}  // extern "C"
