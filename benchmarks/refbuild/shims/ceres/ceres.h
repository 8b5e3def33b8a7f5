// COMPILE-ONLY ceres stub for the reference benchmark build.
//
// The head-to-head runs initialize the reference filter with groundtruth
// (run_simulation.cpp semantics), so ov_init's ceres-based dynamic MLE is
// never executed — it only has to link. Every entry point aborts loudly
// if it is ever reached at runtime.
#pragma once
#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <string>
#include <utility>
#include <vector>

#include <Eigen/Dense>

#ifndef CHECK
#define CHECK(cond)                                                            \
  if (!(cond)) {                                                               \
    std::fprintf(stderr, "CHECK failed: %s (%s:%d)\n", #cond, __FILE__,        \
                 __LINE__);                                                    \
    std::abort();                                                              \
  }
#endif

namespace ceres {

[[noreturn]] inline void stub_abort(const char *what) {
  std::fprintf(stderr,
               "ceres stub: %s called at runtime. The benchmark build only "
               "supports groundtruth initialization (no dynamic MLE).\n",
               what);
  std::abort();
}

enum LinearSolverType { DENSE_SCHUR, SPARSE_SCHUR, ITERATIVE_SCHUR, DENSE_QR };
enum TrustRegionStrategyType { DOGLEG, LEVENBERG_MARQUARDT };
enum PreconditionerType { SCHUR_JACOBI, JACOBI };
enum TerminationType { CONVERGENCE, NO_CONVERGENCE, FAILURE };
enum class CovarianceAlgorithmType { DENSE_SVD, SPARSE_QR };

class CostFunction {
public:
  virtual ~CostFunction() = default;
  virtual bool Evaluate(double const *const *parameters, double *residuals,
                        double **jacobians) const = 0;
  int num_residuals() const { return num_residuals_; }
  const std::vector<int> &parameter_block_sizes() const {
    return parameter_block_sizes_;
  }

protected:
  void set_num_residuals(int n) { num_residuals_ = n; }
  std::vector<int> *mutable_parameter_block_sizes() {
    return &parameter_block_sizes_;
  }

private:
  int num_residuals_{0};
  std::vector<int> parameter_block_sizes_;
};

class LossFunction {
public:
  virtual ~LossFunction() = default;
};

class CauchyLoss : public LossFunction {
public:
  explicit CauchyLoss(double) {}
};

class LocalParameterization {
public:
  virtual ~LocalParameterization() = default;
  virtual bool Plus(const double *x, const double *delta,
                    double *x_plus_delta) const = 0;
  virtual bool ComputeJacobian(const double *x, double *jacobian) const = 0;
  virtual int GlobalSize() const = 0;
  virtual int LocalSize() const = 0;
};

class Problem {
public:
  void AddParameterBlock(double *, int) { stub_abort("Problem::AddParameterBlock"); }
  void AddParameterBlock(double *, int, LocalParameterization *) {
    stub_abort("Problem::AddParameterBlock");
  }
  void AddResidualBlock(CostFunction *, LossFunction *,
                        const std::vector<double *> &) {
    stub_abort("Problem::AddResidualBlock");
  }
  void SetParameterBlockConstant(double *) {
    stub_abort("Problem::SetParameterBlockConstant");
  }
};

struct IterationSummaryStub {};

class Solver {
public:
  struct Options {
    LinearSolverType linear_solver_type{DENSE_SCHUR};
    TrustRegionStrategyType trust_region_strategy_type{DOGLEG};
    PreconditionerType preconditioner_type{SCHUR_JACOBI};
    int num_threads{1};
    double max_solver_time_in_seconds{1e9};
    int max_num_iterations{100};
    bool minimizer_progress_to_stdout{false};
    double function_tolerance{1e-6};
    double gradient_tolerance{1e-10};
  };
  struct Summary {
    std::vector<IterationSummaryStub> iterations;
    int num_parameters{0};
    int num_residuals{0};
    double initial_cost{0.0};
    double final_cost{0.0};
    TerminationType termination_type{FAILURE};
    std::string message{"ceres stub"};
  };
};

inline void Solve(const Solver::Options &, Problem *, Solver::Summary *) {
  stub_abort("ceres::Solve");
}

class Covariance {
public:
  struct Options {
    int null_space_rank{0};
    double min_reciprocal_condition_number{0.0};
    CovarianceAlgorithmType algorithm_type{CovarianceAlgorithmType::SPARSE_QR};
    bool apply_loss_function{false};
    int num_threads{1};
  };
  explicit Covariance(const Options &) {}
  bool Compute(const std::vector<std::pair<const double *, const double *>> &,
               Problem *) {
    stub_abort("Covariance::Compute");
  }
  bool GetCovarianceBlockInTangentSpace(const double *, const double *,
                                        double *) const {
    stub_abort("Covariance::GetCovarianceBlockInTangentSpace");
  }
};

} // namespace ceres
