// Native primitive-integral kernels for harmonic-oscillator FBR bases.
//
// Counterpart of the reference's only native component
// (/root/reference/pytdscf/basis/_primints.cpp: analytic HO-FBR overlap and
// polynomial integrals between different HO bases), re-derived here with a
// different algorithm: Gauss-Hermite quadrature on the combined Gaussian for
// cross-basis overlaps (exact for the polynomial integrand) plus margined
// ladder algebra for q^n / d^n — mirroring pytdscf_tpu/basis/op_matrix.py,
// against which this module is unit-tested.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the build image).
//
// Build:  g++ -O3 -march=native -shared -fPIC -std=c++20 primints.cpp -o libprimints.so

#include <cmath>
#include <cstdlib>
#include <vector>

namespace {

// Gauss-Hermite nodes/weights for weight e^{-x^2} by Newton iteration on
// the recurrence-evaluated Hermite polynomial (Numerical-Recipes-style
// initial guesses; converges to ~1e-15 in < 10 iterations).
void gauss_hermite(int n, std::vector<double>& x, std::vector<double>& w) {
    x.assign(n, 0.0);
    w.assign(n, 0.0);
    const double eps = 1.0e-14;
    const int m = (n + 1) / 2;
    const double pim4 = 0.7511255444649425;  // pi^{-1/4}
    double z = 0.0;
    for (int i = 0; i < m; ++i) {
        if (i == 0) {
            z = std::sqrt(2.0 * n + 1.0) - 1.85575 * std::pow(2.0 * n + 1.0, -0.16667);
        } else if (i == 1) {
            z -= 1.14 * std::pow(n, 0.426) / z;
        } else if (i == 2) {
            z = 1.86 * z - 0.86 * x[0];
        } else if (i == 3) {
            z = 1.91 * z - 0.91 * x[1];
        } else {
            z = 2.0 * z - x[i - 2];
        }
        double pp = 0.0;
        for (int it = 0; it < 100; ++it) {
            double p1 = pim4, p2 = 0.0;
            for (int j = 0; j < n; ++j) {
                double p3 = p2;
                p2 = p1;
                p1 = z * std::sqrt(2.0 / (j + 1.0)) * p2 -
                     std::sqrt(static_cast<double>(j) / (j + 1.0)) * p3;
            }
            pp = std::sqrt(2.0 * n) * p2;
            double z1 = z;
            z = z1 - p1 / pp;
            if (std::abs(z - z1) <= eps) break;
        }
        x[i] = z;
        x[n - 1 - i] = -z;
        w[i] = 2.0 / (pp * pp);
        w[n - 1 - i] = w[i];
    }
}

// H_m(t) for m = 0..nmax-1 at one point, filled into row storage.
inline void hermite_col(int nmax, double t, double* h) {
    h[0] = 1.0;
    if (nmax > 1) h[1] = 2.0 * t;
    for (int m = 2; m < nmax; ++m)
        h[m] = 2.0 * t * h[m - 1] - 2.0 * (m - 1) * h[m - 2];
}

// C = A(n x k) * B(k x m), row-major dense.
void matmul(const double* A, const double* B, double* C, int n, int k, int m) {
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < m; ++j) {
            double acc = 0.0;
            for (int l = 0; l < k; ++l) acc += A[i * k + l] * B[l * m + j];
            C[i * m + j] = acc;
        }
}

// q-ladder matrix (dim x dim): origin*I + (a + a^T)/sqrt(2w).
std::vector<double> q_ladder(double w, double origin, int dim) {
    std::vector<double> q(dim * dim, 0.0);
    const double c = 1.0 / std::sqrt(2.0 * w);
    for (int i = 0; i < dim; ++i) q[i * dim + i] = origin;
    for (int i = 0; i + 1 < dim; ++i) {
        const double v = c * std::sqrt(i + 1.0);
        q[i * dim + (i + 1)] = v;
        q[(i + 1) * dim + i] = v;
    }
    return q;
}

}  // namespace

extern "C" {

// out[m*nr + k] = <HO_m(wl, al) | HO_k(wr, ar)>  (nl x nr, row-major)
void ho_overlap(double wl, double al, int nl, double wr, double ar, int nr,
                double* out) {
    const double S = wl + wr;
    const double c = (wl * al + wr * ar) / S;
    const double D = wl * wr * (al - ar) * (al - ar) / S;
    const int npts = (nl + nr) / 2 + 2;
    std::vector<double> xg, wg;
    gauss_hermite(npts, xg, wg);

    std::vector<double> Hl(nl), Hr(nr), acc(static_cast<size_t>(nl) * nr, 0.0);
    const double jac = std::sqrt(2.0 / S);
    for (int g = 0; g < npts; ++g) {
        const double q = c + xg[g] * jac;
        hermite_col(nl, std::sqrt(wl) * (q - al), Hl.data());
        hermite_col(nr, std::sqrt(wr) * (q - ar), Hr.data());
        for (int m = 0; m < nl; ++m)
            for (int k = 0; k < nr; ++k) acc[m * nr + k] += wg[g] * Hl[m] * Hr[k];
    }
    // normalisations (w/pi)^{1/4} / sqrt(2^m m!)
    std::vector<double> norml(nl), normr(nr);
    auto fill_norm = [](double w, int n, std::vector<double>& nm) {
        double logf = 0.0;
        for (int m = 0; m < n; ++m) {
            if (m > 0) logf += std::log(static_cast<double>(m));
            nm[m] = std::pow(w / M_PI, 0.25) *
                    std::exp(-0.5 * (m * std::log(2.0) + logf));
        }
    };
    fill_norm(wl, nl, norml);
    fill_norm(wr, nr, normr);
    const double pref = jac * std::exp(-D / 2.0);
    for (int m = 0; m < nl; ++m)
        for (int k = 0; k < nr; ++k)
            out[m * nr + k] = pref * norml[m] * normr[k] * acc[m * nr + k];
}

// out[m*nr + k] = <HO_m(wl, al) | q^p | HO_k(wr, ar)>  (nl x nr)
void ho_poly(double wl, double al, int nl, double wr, double ar, int nr,
             int power, double* out) {
    const int dim = nr + power;
    std::vector<double> ov(static_cast<size_t>(nl) * dim);
    ho_overlap(wl, al, nl, wr, ar, dim, ov.data());
    std::vector<double> q = q_ladder(wr, ar, dim);
    std::vector<double> qp(q);
    for (int p = 1; p < power; ++p) {
        std::vector<double> tmp(static_cast<size_t>(dim) * dim);
        matmul(qp.data(), q.data(), tmp.data(), dim, dim, dim);
        qp.swap(tmp);
    }
    if (power == 0)
        for (int i = 0; i < dim; ++i)
            for (int j = 0; j < dim; ++j) qp[i * dim + j] = (i == j) ? 1.0 : 0.0;
    // out = ov (nl x dim) * qp[:, :nr]
    for (int m = 0; m < nl; ++m)
        for (int k = 0; k < nr; ++k) {
            double acc2 = 0.0;
            for (int l = 0; l < dim; ++l) acc2 += ov[m * dim + l] * qp[l * dim + k];
            out[m * nr + k] = acc2;
        }
}

// out[m*nr + k] = <HO_m(wl, al) | d^order/dq^order | HO_k(wr, ar)>, order 1|2
void ho_deriv(double wl, double al, int nl, double wr, double ar, int nr,
              int order, double* out) {
    const int dim = nr + order;
    std::vector<double> d(static_cast<size_t>(dim) * dim, 0.0);
    const double c = std::sqrt(wr / 2.0);
    for (int i = 0; i + 1 < dim; ++i) {
        const double v = c * std::sqrt(i + 1.0);
        d[i * dim + (i + 1)] = v;    //  a part
        d[(i + 1) * dim + i] = -v;   // -a† part
    }
    std::vector<double> dp(d);
    if (order == 2) {
        std::vector<double> tmp(static_cast<size_t>(dim) * dim);
        matmul(d.data(), d.data(), tmp.data(), dim, dim, dim);
        dp.swap(tmp);
    }
    const bool same = (wl == wr) && (al == ar) && (nl == nr);
    if (same) {
        for (int m = 0; m < nl; ++m)
            for (int k = 0; k < nr; ++k) out[m * nr + k] = dp[m * dim + k];
        return;
    }
    std::vector<double> ov(static_cast<size_t>(nl) * dim);
    ho_overlap(wl, al, nl, wr, ar, dim, ov.data());
    for (int m = 0; m < nl; ++m)
        for (int k = 0; k < nr; ++k) {
            double acc2 = 0.0;
            for (int l = 0; l < dim; ++l) acc2 += ov[m * dim + l] * dp[l * dim + k];
            out[m * nr + k] = acc2;
        }
}

}  // extern "C"
