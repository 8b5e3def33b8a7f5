// FUNCTIONAL mini-ceres for the reference benchmark build.
//
// Implements the exact API surface ov_init's dynamic MLE uses
// (DynamicInitializer.cpp:574-1080): Problem with parameter blocks /
// local parameterizations / constant blocks, robust residual blocks
// (CauchyLoss), a dense Levenberg-Marquardt solver over the tangent
// space, and tangent-space marginal covariance recovery via
// pseudo-inverse of the final Gauss-Newton Hessian. The problems the
// reference builds here are small (a few hundred local dofs), so dense
// normal equations match DENSE_SCHUR's result without the elimination
// ordering.
//
// This replaces the earlier compile-only stub so the reference's
// DynamicInitializer can RUN in the head-to-head harness (no system
// ceres exists in this image).
#pragma once
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <map>
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
  // rho(s), rho'(s) for squared residual norm s
  virtual void Eval(double s, double *rho, double *rho1) const = 0;
};

class CauchyLoss : public LossFunction {
public:
  explicit CauchyLoss(double a) : a2_(a * a) {}
  void Eval(double s, double *rho, double *rho1) const override {
    *rho = a2_ * std::log1p(s / a2_);
    *rho1 = 1.0 / (1.0 + s / a2_);
  }

private:
  double a2_;
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
  struct Block {
    double *ptr;
    int global_size;
    LocalParameterization *param{nullptr};
    bool constant{false};
    int local_off{-1}; // assigned at solve time; -1 for constant
    int local_size() const {
      return param ? param->LocalSize() : global_size;
    }
  };
  struct Residual {
    CostFunction *cost;
    LossFunction *loss;
    std::vector<double *> params;
  };

  void AddParameterBlock(double *p, int size) { add_block(p, size, nullptr); }
  void AddParameterBlock(double *p, int size, LocalParameterization *lp) {
    add_block(p, size, lp);
  }
  void AddResidualBlock(CostFunction *c, LossFunction *l,
                        const std::vector<double *> &params) {
    // implicit parameter registration like real ceres
    const auto &sizes = c->parameter_block_sizes();
    for (size_t i = 0; i < params.size(); i++)
      if (!index_.count(params[i]))
        add_block(params[i], sizes[i], nullptr);
    residuals_.push_back({c, l, params});
  }
  void SetParameterBlockConstant(double *p) {
    blocks_[index_.at(p)].constant = true;
  }

  // ---- solver internals (used by Solve/Covariance below) ----
  int assign_offsets() {
    int off = 0;
    for (auto &b : blocks_) {
      b.local_off = b.constant ? -1 : off;
      if (!b.constant)
        off += b.local_size();
    }
    return off;
  }
  // robust-weighted cost, and optionally accumulate H/g over local dofs
  double evaluate(int ndof, Eigen::MatrixXd *H, Eigen::VectorXd *g,
                  bool apply_loss = true) {
    double cost = 0.0;
    if (H) {
      H->setZero(ndof, ndof);
      g->setZero(ndof);
    }
    std::vector<double> res;
    std::vector<std::vector<double>> jacs;
    std::vector<double *> jac_ptrs;
    for (auto &rb : residuals_) {
      int nr = rb.cost->num_residuals();
      const auto &sizes = rb.cost->parameter_block_sizes();
      res.assign(nr, 0.0);
      jacs.resize(sizes.size());
      jac_ptrs.assign(sizes.size(), nullptr);
      for (size_t i = 0; i < sizes.size(); i++) {
        if (H) {
          jacs[i].assign((size_t)nr * sizes[i], 0.0);
          jac_ptrs[i] = jacs[i].data();
        }
      }
      if (!rb.cost->Evaluate(rb.params.data(), res.data(),
                             H ? jac_ptrs.data() : nullptr))
        continue;
      Eigen::Map<Eigen::VectorXd> r(res.data(), nr);
      double s = r.squaredNorm();
      double rho = s, rho1 = 1.0;
      if (rb.loss && apply_loss)
        rb.loss->Eval(s, &rho, &rho1);
      cost += 0.5 * rho;
      if (!H)
        continue;
      double w = std::sqrt(rho1); // Triggs correction, first order
      for (size_t i = 0; i < sizes.size(); i++) {
        const Block &bi = blocks_[index_.at(rb.params[i])];
        if (bi.constant)
          continue;
        Eigen::Map<Eigen::Matrix<double, Eigen::Dynamic, Eigen::Dynamic,
                                 Eigen::RowMajor>>
            Ji(jacs[i].data(), nr, sizes[i]);
        Eigen::MatrixXd Jli;
        if (bi.param) {
          Eigen::Matrix<double, Eigen::Dynamic, Eigen::Dynamic,
                        Eigen::RowMajor>
              Jp(bi.global_size, bi.param->LocalSize());
          bi.param->ComputeJacobian(bi.ptr, Jp.data());
          Jli = w * (Ji * Jp);
        } else {
          Jli = w * Ji;
        }
        g->segment(bi.local_off, Jli.cols()).noalias() +=
            Jli.transpose() * (w * r);
        for (size_t j = i; j < sizes.size(); j++) {
          const Block &bj = blocks_[index_.at(rb.params[j])];
          if (bj.constant)
            continue;
          Eigen::Map<Eigen::Matrix<double, Eigen::Dynamic, Eigen::Dynamic,
                                   Eigen::RowMajor>>
              Jj(jacs[j].data(), nr, sizes[j]);
          Eigen::MatrixXd Jlj;
          if (bj.param) {
            Eigen::Matrix<double, Eigen::Dynamic, Eigen::Dynamic,
                          Eigen::RowMajor>
                Jp(bj.global_size, bj.param->LocalSize());
            bj.param->ComputeJacobian(bj.ptr, Jp.data());
            Jlj = w * (Jj * Jp);
          } else {
            Jlj = w * Jj;
          }
          Eigen::MatrixXd Hij = Jli.transpose() * Jlj;
          H->block(bi.local_off, bj.local_off, Hij.rows(), Hij.cols()) += Hij;
          if (j != i)
            H->block(bj.local_off, bi.local_off, Hij.cols(), Hij.rows()) +=
                Hij.transpose();
        }
      }
    }
    return cost;
  }
  void apply_step(const Eigen::VectorXd &dx, std::vector<double> &backup) {
    backup.clear();
    for (auto &b : blocks_) {
      for (int i = 0; i < b.global_size; i++)
        backup.push_back(b.ptr[i]);
      if (b.constant)
        continue;
      if (b.param) {
        std::vector<double> xp(b.global_size);
        b.param->Plus(b.ptr, dx.data() + b.local_off, xp.data());
        for (int i = 0; i < b.global_size; i++)
          b.ptr[i] = xp[i];
      } else {
        for (int i = 0; i < b.local_size(); i++)
          b.ptr[i] += dx[b.local_off + i];
      }
    }
  }
  void restore(const std::vector<double> &backup) {
    size_t k = 0;
    for (auto &b : blocks_) {
      for (int i = 0; i < b.global_size; i++)
        b.ptr[i] = backup[k++];
    }
  }
  int num_parameters() const {
    int n = 0;
    for (auto &b : blocks_)
      n += b.global_size;
    return n;
  }
  int num_residual_values() const {
    int n = 0;
    for (auto &r : residuals_)
      n += r.cost->num_residuals();
    return n;
  }
  const Block &block_of(const double *p) const {
    return blocks_[index_.at(const_cast<double *>(p))];
  }
  size_t num_residual_blocks() const { return residuals_.size(); }

private:
  void add_block(double *p, int size, LocalParameterization *lp) {
    auto it = index_.find(p);
    if (it != index_.end()) {
      if (lp)
        blocks_[it->second].param = lp;
      return;
    }
    index_[p] = blocks_.size();
    blocks_.push_back({p, size, lp, false, -1});
  }
  std::vector<Block> blocks_;
  std::map<double *, size_t> index_;
  std::vector<Residual> residuals_;

  friend class Covariance;
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
    std::string message{"mini-ceres"};
  };
};

// Dense Levenberg-Marquardt over the tangent space.
inline void Solve(const Solver::Options &opts, Problem *problem,
                  Solver::Summary *summary) {
  int ndof = problem->assign_offsets();
  summary->num_parameters = problem->num_parameters();
  summary->num_residuals = problem->num_residual_values();
  Eigen::MatrixXd H;
  Eigen::VectorXd g;
  double cost = problem->evaluate(ndof, &H, &g);
  summary->initial_cost = cost;
  if (ndof == 0 || opts.max_num_iterations == 0) {
    summary->final_cost = cost;
    summary->termination_type = CONVERGENCE;
    summary->message = "no free parameters or zero iterations";
    return;
  }
  double lambda = 1e-4;
  std::vector<double> backup;
  summary->termination_type = NO_CONVERGENCE;
  for (int it = 0; it < opts.max_num_iterations; it++) {
    summary->iterations.emplace_back();
    Eigen::MatrixXd A = H;
    for (int i = 0; i < ndof; i++)
      A(i, i) += lambda * std::max(H(i, i), 1e-12);
    Eigen::VectorXd dx = A.ldlt().solve(-g);
    if (!dx.allFinite()) {
      lambda *= 10.0;
      continue;
    }
    problem->apply_step(dx, backup);
    Eigen::MatrixXd H_new;
    Eigen::VectorXd g_new;
    double cost_new = problem->evaluate(ndof, &H_new, &g_new);
    if (std::isfinite(cost_new) && cost_new < cost) {
      double rel = (cost - cost_new) / std::max(cost, 1e-30);
      cost = cost_new;
      H.swap(H_new);
      g.swap(g_new);
      lambda = std::max(lambda * 0.35, 1e-12);
      if (rel < opts.function_tolerance) {
        summary->termination_type = CONVERGENCE;
        summary->message = "function tolerance reached";
        break;
      }
    } else {
      problem->restore(backup);
      lambda *= 10.0;
      if (lambda > 1e12) {
        summary->termination_type = CONVERGENCE;
        summary->message = "trust region exhausted at minimum";
        break;
      }
    }
    if (g.lpNorm<Eigen::Infinity>() < opts.gradient_tolerance) {
      summary->termination_type = CONVERGENCE;
      summary->message = "gradient tolerance reached";
      break;
    }
  }
  if (summary->termination_type == NO_CONVERGENCE &&
      !summary->iterations.empty())
    summary->termination_type = CONVERGENCE; // iteration cap, best effort
  summary->final_cost = cost;
}

// Tangent-space marginal covariance = pseudo-inverse of the final
// Gauss-Newton Hessian (rank-deficiency tolerated via eigen cutoff,
// mirroring ceres' null_space_rank / min_reciprocal_condition_number).
class Covariance {
public:
  struct Options {
    int null_space_rank{0};
    double min_reciprocal_condition_number{0.0};
    CovarianceAlgorithmType algorithm_type{CovarianceAlgorithmType::SPARSE_QR};
    bool apply_loss_function{false};
    int num_threads{1};
  };
  explicit Covariance(const Options &o) : opts_(o) {}

  bool Compute(const std::vector<std::pair<const double *, const double *>> &,
               Problem *problem) {
    problem_ = problem;
    int ndof = problem->assign_offsets();
    Eigen::MatrixXd H;
    Eigen::VectorXd g;
    problem->evaluate(ndof, &H, &g, opts_.apply_loss_function);
    // eigendecomposition pinv with relative cutoff
    Eigen::SelfAdjointEigenSolver<Eigen::MatrixXd> es(H);
    if (es.info() != Eigen::Success)
      return false;
    const auto &ev = es.eigenvalues();
    double emax = ev.cwiseAbs().maxCoeff();
    double tol = std::max(opts_.min_reciprocal_condition_number, 1e-14) * emax;
    Eigen::VectorXd inv = ev.unaryExpr(
        [&](double e) { return (e > tol) ? 1.0 / e : 0.0; });
    cov_ = es.eigenvectors() * inv.asDiagonal() * es.eigenvectors().transpose();
    return cov_.allFinite();
  }

  bool GetCovarianceBlockInTangentSpace(const double *a, const double *b,
                                        double *out) const {
    const auto &ba = problem_->block_of(a);
    const auto &bb = problem_->block_of(b);
    int la = ba.local_size(), lb = bb.local_size();
    Eigen::Map<Eigen::Matrix<double, Eigen::Dynamic, Eigen::Dynamic,
                             Eigen::RowMajor>>
        M(out, la, lb);
    if (ba.local_off < 0 || bb.local_off < 0) {
      M.setZero(); // constant block: zero covariance
      return true;
    }
    M = cov_.block(ba.local_off, bb.local_off, la, lb);
    return true;
  }

private:
  Options opts_;
  Problem *problem_{nullptr};
  Eigen::MatrixXd cov_;
};

} // namespace ceres
