// Head-to-head driver for the REFERENCE'S NOVEL LAYER: UVioManager with
// UWB range updates + bias-compensated anchors (uvio/src/), ROS-free.
//
// Like ref_head2head.cc (base VIO), but constructs uvio::UVioManager,
// simulates biased UWB ranges from a truth sidecar file, feeds them via
// feed_measurement_uwb, and replicates the manager's buffered-range
// drain (UVioManager.cpp:178-188) before each camera update — the drain
// lives in the UVIO track_image_and_update override, which the TrackSIM
// path (feed_measurement_simulation) bypasses in the reference.
//
// Extra outputs on top of ref_head2head's:
//   <out>/uwb.csv         t anchor_id range     (exact fed measurements)
//   <out>/anchors_est.txt id px py pz gamma alpha   (final anchor state)
//
// Usage: ref_uwb_head2head <estimator_config.yaml> <out_dir> <truth.csv>
//        [max_seconds]
// truth.csv line 1: rate,sigma,seed,t_offset,pux,puy,puz   (p_UinI true)
//           lines:  id,px,py,pz,gamma,alpha                (true anchors)
#include <chrono>
#include <cstdio>
#include <fstream>
#include <memory>
#include <random>
#include <sstream>
#include <string>
#include <vector>

// The drain loop + per-range update entry points are private members of
// UVioManager (the reference exposes them only through its ROS-facing
// track_image_and_update). Test-driver-only access hack; the member
// symbols are unaffected by access specifiers.
#define private public
#include "core/UVioManager.h"
#undef private
#include "core/UVioManagerOptions.h"
#include "sim/Simulator.h"
#include "state/State.h"
#include "utils/opencv_yaml_parse.h"
#include "utils/print.h"
#include "utils/quat_ops.h"
#include "utils/sensor_data.h"

using namespace ov_msckf;

struct TrueAnchor {
  size_t id;
  Eigen::Vector3d p;
  double gamma, alpha;
};

int main(int argc, char **argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <config.yaml> <out_dir> <truth.csv> [max_seconds]\n", argv[0]);
    return 1;
  }
  std::string config_path = argv[1];
  std::string out = argv[2];
  std::string truth_path = argv[3];
  double max_seconds = (argc > 4) ? std::stod(argv[4]) : 1e9;

  // ---- truth sidecar ----
  double uwb_rate = 10.0, uwb_sigma = 0.1, uwb_toff = 0.037;
  unsigned uwb_seed = 1234;
  Eigen::Vector3d p_UinI_true = Eigen::Vector3d::Zero();
  std::vector<TrueAnchor> truth;
  {
    std::ifstream f(truth_path);
    if (!f.good()) {
      std::fprintf(stderr, "cannot read %s\n", truth_path.c_str());
      return 1;
    }
    std::string line;
    bool first = true;
    while (std::getline(f, line)) {
      if (line.empty() || line[0] == '#')
        continue;
      std::stringstream ss(line);
      std::vector<double> v;
      std::string tok;
      while (std::getline(ss, tok, ','))
        v.push_back(std::stod(tok));
      if (first) {
        uwb_rate = v.at(0);
        uwb_sigma = v.at(1);
        uwb_seed = (unsigned)v.at(2);
        uwb_toff = v.at(3);
        p_UinI_true << v.at(4), v.at(5), v.at(6);
        first = false;
      } else {
        TrueAnchor a;
        a.id = (size_t)v.at(0);
        a.p << v.at(1), v.at(2), v.at(3);
        a.gamma = v.at(4);
        a.alpha = v.at(5);
        truth.push_back(a);
      }
    }
  }

  auto parser = std::make_shared<ov_core::YamlParser>(config_path);
  std::string verbosity = "WARNING";
  parser->parse_config("verbosity", verbosity);
  ov_core::Printer::setPrintLevel(verbosity);

  uvio::UVioManagerOptions params;
  params.print_and_load(parser);
  params.print_and_load_simulation(parser);
  params.num_opencv_threads = 0;
  params.use_multi_threading_pubs = false;
  params.use_multi_threading_subs = false;
  auto sim = std::make_shared<Simulator>(params);
  auto sys = std::make_shared<uvio::UVioManager>(params);
  if (!parser->successful()) {
    std::fprintf(stderr, "config parse failure\n");
    return 1;
  }

  double next_imu_time = sim->current_timestamp() + 1.0 / params.sim_freq_imu;
  Eigen::Matrix<double, 17, 1> imustate;
  if (!sim->get_state(next_imu_time, imustate)) {
    std::fprintf(stderr, "simulator could not produce the initial state\n");
    return 1;
  }
  double dt_true = sim->get_true_parameters().calib_camimu_dt;
  imustate(0, 0) -= dt_true;
  sys->initialize_with_gt(imustate);

  std::ofstream f_imu(out + "/imu.csv"), f_cam(out + "/cam.csv"), f_uwb(out + "/uwb.csv");
  std::ofstream f_init(out + "/init.txt"), f_est(out + "/ref_est.txt"), f_gt(out + "/gt.txt");
  f_imu.precision(17);
  f_cam.precision(17);
  f_uwb.precision(17);
  f_init.precision(17);
  f_est.precision(17);
  f_gt.precision(17);
  for (int i = 0; i < 17; i++)
    f_init << imustate(i, 0) << (i + 1 < 17 ? " " : "\n");

  std::mt19937_64 rng(uwb_seed);
  std::normal_distribution<double> gauss(0.0, 1.0);
  double t_start = -1;
  double next_uwb = -1;
  int n_frames = 0, n_uwb = 0;
  auto clk0 = std::chrono::steady_clock::now();

  double buffer_timecam = -1;
  std::vector<int> buffer_camids;
  std::vector<std::vector<std::pair<size_t, Eigen::VectorXf>>> buffer_feats;

  while (sim->ok()) {
    ov_core::ImuData m;
    if (sim->get_next_imu(m.timestamp, m.wm, m.am)) {
      if (t_start < 0) {
        t_start = m.timestamp;
        next_uwb = t_start + uwb_toff;
      }
      if (m.timestamp - t_start > max_seconds)
        break;
      sys->feed_measurement_imu(m);
      f_imu << m.timestamp << "," << m.wm(0) << "," << m.wm(1) << "," << m.wm(2) << ","
            << m.am(0) << "," << m.am(1) << "," << m.am(2) << "\n";

      // scheduled UWB range sets (camera/state clock, between frames)
      while (next_uwb <= m.timestamp - dt_true) {
        Eigen::Matrix<double, 17, 1> gts;
        if (sim->get_state(next_uwb + dt_true, gts)) {
          Eigen::Matrix3d R_GtoI = ov_core::quat_2_Rot(gts.block(1, 0, 4, 1));
          Eigen::Vector3d p_IinG = gts.block(5, 0, 3, 1);
          Eigen::Vector3d p_UinG = p_IinG + R_GtoI.transpose() * p_UinI_true;
          uvio::UwbData msg;
          msg.timestamp = next_uwb;
          for (auto const &a : truth) {
            double d = (a.p - p_UinG).norm();
            double y = (1.0 + a.alpha) * d + a.gamma + uwb_sigma * gauss(rng);
            msg.uwb_ranges.insert({a.id, y});
            f_uwb << next_uwb << "," << a.id << "," << y << "\n";
          }
          sys->feed_measurement_uwb(msg);
          n_uwb++;
        }
        next_uwb += 1.0 / uwb_rate;
      }
    }
    double time_cam;
    std::vector<int> camids;
    std::vector<std::vector<std::pair<size_t, Eigen::VectorXf>>> feats;
    if (sim->get_next_cam(time_cam, camids, feats)) {
      if (buffer_timecam != -1) {
        // UVIO buffered-range drain (UVioManager.cpp:178-188): apply
        // ranges strictly older than the image, newer than the state
        auto &past = sys->past_measurements;
        if (!past.empty()) {
          for (auto it = past.begin(); it != past.lower_bound(buffer_timecam); it++) {
            if (it->first < buffer_timecam && it->first > sys->get_state()->_timestamp) {
              sys->do_uwb_propagate_update(it->second);
            }
          }
          past.erase(past.begin(), past.upper_bound(buffer_timecam));
        }
        sys->feed_measurement_simulation(buffer_timecam, buffer_camids, buffer_feats);
        n_frames++;
        auto state = sys->get_state();
        Eigen::Vector4d q = state->_imu->quat();
        Eigen::Vector3d p = state->_imu->pos();
        f_est << state->_timestamp << " " << p(0) << " " << p(1) << " " << p(2) << " "
              << q(0) << " " << q(1) << " " << q(2) << " " << q(3) << "\n";
        Eigen::Matrix<double, 17, 1> gts;
        if (sim->get_state(buffer_timecam + dt_true, gts)) {
          f_gt << state->_timestamp << " " << gts(5) << " " << gts(6) << " " << gts(7) << " "
               << gts(1) << " " << gts(2) << " " << gts(3) << " " << gts(4) << "\n";
        }
      }
      buffer_timecam = time_cam;
      buffer_camids = camids;
      buffer_feats = feats;
      for (size_t c = 0; c < camids.size(); c++)
        for (auto &pr : feats[c])
          f_cam << time_cam << "," << camids[c] << "," << pr.first << ","
                << pr.second(0) << "," << pr.second(1) << "\n";
    }
  }
  auto clk1 = std::chrono::steady_clock::now();
  double wall = std::chrono::duration<double>(clk1 - clk0).count();

  // final anchor estimates
  {
    std::ofstream f_anc(out + "/anchors_est.txt");
    f_anc.precision(12);
    auto ustate = sys->get_uvio_state();
    for (auto const &kv : ustate->_calib_GLOBALtoANCHORS) {
      auto a = kv.second;
      f_anc << kv.first << " " << a->p_AinG()->value()(0) << " " << a->p_AinG()->value()(1)
            << " " << a->p_AinG()->value()(2) << " " << a->const_bias()->value()(0) << " "
            << a->dist_bias()->value()(0) << "\n";
    }
  }
  std::printf("{\"frames\": %d, \"uwb_sets\": %d, \"wall_s\": %.3f, \"fps\": %.1f}\n", n_frames,
              n_uwb, wall, n_frames / wall);
  return 0;
}
