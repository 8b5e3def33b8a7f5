// Head-to-head driver for SELF-INITIALIZATION: no groundtruth init —
// the reference runs its own InertialInitializer (static or dynamic
// dispatch, ov_init/src/init/InertialInitializer.cpp:73-147) fed by
// TrackSIM features, plus UpdaterZeroVelocity holds during stillness.
//
// The stock sim path (feed_measurement_simulation) hard-exits when the
// filter is uninitialized, so pre-init this driver replicates its
// TrackSIM install + feed and drives VioManager::try_to_initialize
// directly (single-threaded: use_multi_threading_subs=false joins the
// init thread, VioManagerHelper.cpp:180-186).
//
// Outputs (on top of ref_head2head's imu/cam/gt dumps):
//   <out>/initinfo.txt   t_first t_init   (wall of stream, init stamp)
//   <out>/ref_est.txt    TUM rows only after initialization
//
// Usage: ref_selfinit_head2head <estimator_config.yaml> <out_dir> [max_seconds]
#include <chrono>
#include <cstdio>
#include <fstream>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

// Pull in every transitive std/OpenCV/Eigen dependency of VioManager.h
// FIRST so the access-override below only affects the reference's own
// headers (redefining `private` inside libstdc++ headers breaks them).
#include "core/VioManagerOptions.h"
#include "init/InertialInitializer.h"
#include "sim/Simulator.h"
#include "state/State.h"
#include "track/TrackSIM.h"
#include "update/UpdaterZeroVelocity.h"
#include "utils/opencv_yaml_parse.h"
#include "utils/print.h"
#include "utils/sensor_data.h"

// try_to_initialize / trackFEATS / initializer / updaterZUPT are
// protected or private; driver-only access (symbols unaffected).
#define private public
#define protected public
#include "core/VioManager.h"
#undef protected
#undef private

using namespace ov_msckf;

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <config.yaml> <out_dir> [max_seconds]\n", argv[0]);
    return 1;
  }
  std::string config_path = argv[1];
  std::string out = argv[2];
  double max_seconds = (argc > 3) ? std::stod(argv[3]) : 1e9;

  auto parser = std::make_shared<ov_core::YamlParser>(config_path);
  std::string verbosity = "WARNING";
  parser->parse_config("verbosity", verbosity);
  ov_core::Printer::setPrintLevel(verbosity);

  VioManagerOptions params;
  params.print_and_load(parser);
  params.print_and_load_simulation(parser);
  params.num_opencv_threads = 0;
  params.use_multi_threading_pubs = false;
  params.use_multi_threading_subs = false; // join init thread = deterministic
  auto sim = std::make_shared<Simulator>(params);
  auto sys = std::make_shared<VioManager>(params);
  if (!parser->successful()) {
    std::fprintf(stderr, "config parse failure\n");
    return 1;
  }

  // Install TrackSIM up front (the exact swap feed_measurement_simulation
  // performs on first call, VioManager.cpp:199-212) so the pre-init
  // feature feed + initializer share the same database.
  auto trackSIM = std::make_shared<ov_core::TrackSIM>(sys->state->_cam_intrinsics_cameras,
                                                      sys->state->_options.max_aruco_features);
  sys->trackFEATS = trackSIM;
  sys->initializer = std::make_shared<ov_init::InertialInitializer>(
      params.init_options, sys->trackFEATS->get_feature_database());
  if (params.try_zupt) {
    sys->updaterZUPT = std::make_shared<UpdaterZeroVelocity>(
        params.zupt_options, params.imu_noises, sys->trackFEATS->get_feature_database(),
        sys->propagator, params.gravity_mag, params.zupt_max_velocity,
        params.zupt_noise_multiplier, params.zupt_max_disparity);
  }

  std::ofstream f_imu(out + "/imu.csv"), f_cam(out + "/cam.csv");
  std::ofstream f_est(out + "/ref_est.txt"), f_gt(out + "/gt.txt");
  std::ofstream f_info(out + "/initinfo.txt");
  f_imu.precision(17);
  f_cam.precision(17);
  f_est.precision(17);
  f_gt.precision(17);
  f_info.precision(17);

  double dt_true = sim->get_true_parameters().calib_camimu_dt;
  double t_start = -1, t_init = -1;
  int n_frames = 0;
  auto clk0 = std::chrono::steady_clock::now();

  double buffer_timecam = -1;
  std::vector<int> buffer_camids;
  std::vector<std::vector<std::pair<size_t, Eigen::VectorXf>>> buffer_feats;

  while (sim->ok()) {
    ov_core::ImuData m;
    if (sim->get_next_imu(m.timestamp, m.wm, m.am)) {
      if (t_start < 0)
        t_start = m.timestamp;
      if (m.timestamp - t_start > max_seconds)
        break;
      sys->feed_measurement_imu(m);
      f_imu << m.timestamp << "," << m.wm(0) << "," << m.wm(1) << "," << m.wm(2) << ","
            << m.am(0) << "," << m.am(1) << "," << m.am(2) << "\n";
    }
    double time_cam;
    std::vector<int> camids;
    std::vector<std::vector<std::pair<size_t, Eigen::VectorXf>>> feats;
    if (sim->get_next_cam(time_cam, camids, feats)) {
      if (buffer_timecam != -1) {
        if (!sys->is_initialized_vio) {
          // pre-init: feed tracker + drive the initializer, mirroring
          // track_image_and_update's uninitialized branch
          trackSIM->feed_measurement_simulation(buffer_timecam, buffer_camids, buffer_feats);
          ov_core::CameraData msg;
          msg.timestamp = buffer_timecam;
          sys->is_initialized_vio = sys->try_to_initialize(msg);
          if (sys->is_initialized_vio && t_init < 0)
            t_init = sys->state->_timestamp;
        } else {
          sys->feed_measurement_simulation(buffer_timecam, buffer_camids, buffer_feats);
          if (t_init < 0)
            t_init = sys->state->_timestamp;
        }
        n_frames++;
        if (sys->is_initialized_vio) {
          auto state = sys->get_state();
          Eigen::Vector4d q = state->_imu->quat();
          Eigen::Vector3d p = state->_imu->pos();
          f_est << state->_timestamp << " " << p(0) << " " << p(1) << " " << p(2) << " "
                << q(0) << " " << q(1) << " " << q(2) << " " << q(3) << "\n";
        }
        Eigen::Matrix<double, 17, 1> gts;
        if (sim->get_state(buffer_timecam + dt_true, gts)) {
          f_gt << buffer_timecam << " " << gts(5) << " " << gts(6) << " " << gts(7) << " "
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
  f_info << t_start << " " << t_init << "\n";
  std::printf("{\"frames\": %d, \"t_init\": %.6f, \"init_latency_s\": %.3f, \"wall_s\": %.3f, "
              "\"fps\": %.1f}\n",
              n_frames, t_init, (t_init < 0 ? -1.0 : t_init - t_start), wall, n_frames / wall);
  return t_init < 0 ? 2 : 0;
}
