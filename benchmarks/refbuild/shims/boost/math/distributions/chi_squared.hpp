// Minimal chi-squared quantile stand-in for boost::math used by the
// reference benchmark build. quantile(chi_squared(k), p) is computed by
// bisection on the regularized lower incomplete gamma P(k/2, x/2)
// (standard series / continued-fraction evaluation). Called only at
// startup to fill chi2 tables, so speed is irrelevant; bisection gives
// ~1e-12 relative accuracy.
#pragma once
#include <cmath>
#include <limits>

namespace boost {
namespace math {

struct chi_squared {
  double k;
  explicit chi_squared(double dof) : k(dof) {}
};

namespace detail {

// regularized lower incomplete gamma P(a, x)
inline double gammp(double a, double x) {
  if (x <= 0.0)
    return 0.0;
  const double gln = std::lgamma(a);
  if (x < a + 1.0) {
    // series representation
    double ap = a, sum = 1.0 / a, del = sum;
    for (int n = 0; n < 500; ++n) {
      ap += 1.0;
      del *= x / ap;
      sum += del;
      if (std::fabs(del) < std::fabs(sum) * 1e-16)
        break;
    }
    return sum * std::exp(-x + a * std::log(x) - gln);
  }
  // continued fraction for Q(a, x)
  const double tiny = std::numeric_limits<double>::min() / 1e-30;
  double b = x + 1.0 - a, c = 1.0 / tiny, d = 1.0 / b, h = d;
  for (int i = 1; i < 500; ++i) {
    double an = -1.0 * i * (i - a);
    b += 2.0;
    d = an * d + b;
    if (std::fabs(d) < tiny)
      d = tiny;
    c = b + an / c;
    if (std::fabs(c) < tiny)
      c = tiny;
    d = 1.0 / d;
    double delt = d * c;
    h *= delt;
    if (std::fabs(delt - 1.0) < 1e-16)
      break;
  }
  return 1.0 - std::exp(-x + a * std::log(x) - gln) * h;
}

} // namespace detail

inline double quantile(const chi_squared &dist, double p) {
  const double a = 0.5 * dist.k;
  // bracket: chi2 quantiles are below k + 12*sqrt(2k) + 60 for p <= 0.9999
  double lo = 0.0, hi = dist.k + 12.0 * std::sqrt(2.0 * dist.k) + 60.0;
  while (detail::gammp(a, 0.5 * hi) < p)
    hi *= 2.0;
  for (int i = 0; i < 200; ++i) {
    double mid = 0.5 * (lo + hi);
    if (detail::gammp(a, 0.5 * mid) < p)
      lo = mid;
    else
      hi = mid;
  }
  return 0.5 * (lo + hi);
}

} // namespace math
} // namespace boost
