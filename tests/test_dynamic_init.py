"""Dynamic initializer tests against the simulator groundtruth
(the `ov_init/src/test_dynamic_init.cpp` analogue)."""

import jax.numpy as jnp
import numpy as np
import pytest

from uvio_tpu.init.cpi import preintegrate
from uvio_tpu.init.dynamic_init import (
    DynamicInitOptions,
    result_to_state,
    solve_dynamic_init,
)
from uvio_tpu.math import quat_to_rot
from uvio_tpu.sim import SimParams, Simulator, circle_trajectory

G = 9.81


def make_window(sim, n_pose=6, cam_dt=0.3, f_max=20, noise=False, seed=0):
    """Collect a window of IMU + exact feature obs from the simulator."""
    t0 = sim.t_start + 1.0
    pose_times = t0 + np.arange(n_pose) * cam_dt
    # IMU slices between pose times
    imu = []
    t = t0
    all_t, all_w, all_a = [], [], []
    while t <= pose_times[-1] + 0.02:
        st = sim.get_gt_state(t)
        # exact IMU (no noise, no bias)
        import uvio_tpu.sim.bspline as bs

        s = bs.state_at_batch(sim.controls, sim.t0_traj, sim.dt_ctrl, jnp.asarray([t]))
        R = np.asarray(s["R_GtoI"][0])
        am = R @ (np.asarray(s["a_IinG"][0]) + np.array([0, 0, G]))
        wm = np.asarray(s["w_IinI"][0])
        all_t.append(t)
        all_w.append(wm)
        all_a.append(am)
        t += 1.0 / 200.0
    if noise:
        rng = np.random.default_rng(seed)
        dt = 1.0 / 200.0
        all_w = [w + 1.7e-4 / np.sqrt(dt) * rng.standard_normal(3) for w in all_w]
        all_a = [a + 2.0e-3 / np.sqrt(dt) * rng.standard_normal(3) for a in all_a]
    all_t = np.asarray(all_t)
    all_w = np.stack(all_w)
    all_a = np.stack(all_a)

    # slice with exact boundary interpolation (the production path)
    from uvio_tpu.filter.propagator import select_imu_readings_np

    M = 128
    imu_t = np.zeros((n_pose - 1, M))
    imu_w = np.zeros((n_pose - 1, M, 3))
    imu_a = np.zeros((n_pose - 1, M, 3))
    for i in range(n_pose - 1):
        tt, ww, aa = select_imu_readings_np(
            all_t, all_w, all_a, pose_times[i], pose_times[i + 1], M
        )
        imu_t[i], imu_w[i], imu_a[i] = tt, ww, aa

    # exact normalized obs of map points in the I0 frame convention
    import uvio_tpu.sim.bspline as bs

    states = bs.state_at_batch(
        sim.controls, sim.t0_traj, sim.dt_ctrl, jnp.asarray(pose_times)
    )
    R_GtoI = np.asarray(states["R_GtoI"])
    p_IinG = np.asarray(states["p_IinG"])
    cam = sim.params.cameras[0]
    R_ItoC = np.asarray(quat_to_rot(jnp.asarray(cam.q_ItoC)))
    pts = sim.map_pts[:200]
    obs = np.zeros((f_max, n_pose, 2))
    mask = np.zeros((f_max, n_pose), bool)
    count = 0
    for j in range(len(pts)):
        uvs = []
        ok = True
        for p in range(n_pose):
            pc = R_ItoC @ (R_GtoI[p] @ (pts[j] - p_IinG[p])) + cam.p_IinC
            if pc[2] < 0.5:
                ok = False
                break
            uvs.append(pc[:2] / pc[2])
        if ok and np.all(np.abs(np.asarray(uvs)) < 0.8):
            obs[count, :, :] = uvs
            if noise:
                rng2 = np.random.default_rng(seed + 1 + j)
                obs[count] += (1.0 / 458.0) * rng2.standard_normal((n_pose, 2))
            mask[count, :] = True
            count += 1
            if count == f_max:
                break
    gt = {
        "R_GtoI0": R_GtoI[0],
        "p0": p_IinG[0],
        "v0_G": np.asarray(states["v_IinG"][0]),
        "R_GtoIP": R_GtoI[-1],
        "vP_G": np.asarray(states["v_IinG"][-1]),
        "pose_times": pose_times,
    }
    return (imu_t, imu_w, imu_a), (obs, mask), (R_ItoC, np.asarray(cam.p_IinC)), gt


def test_cpi_matches_groundtruth_motion():
    sim = Simulator(SimParams(seed=5), trajectory=circle_trajectory(duration=14.0))
    (imu_t, imu_w, imu_a), _, _, gt = make_window(sim, n_pose=2, cam_dt=0.5)
    out = preintegrate(
        jnp.asarray(imu_t[0]), jnp.asarray(imu_w[0]), jnp.asarray(imu_a[0]),
        jnp.zeros(3), jnp.zeros(3),
    )
    # R_k2tau == R_GtoIP R_GtoI0^T
    expect = gt["R_GtoIP"] @ gt["R_GtoI0"].T
    np.testing.assert_allclose(np.asarray(out["R_k2tau"]), expect, atol=2e-4)
    # beta check: v_P = v_0 - g dt + R_GtoI0^T beta  (all in G frame via I0)
    dt = float(out["dt"])
    g_G = np.array([0, 0, G])
    beta_G = gt["R_GtoI0"].T @ np.asarray(out["beta"])
    vP_pred = gt["v0_G"] - g_G * dt + beta_G
    np.testing.assert_allclose(vP_pred, gt["vP_G"], atol=2e-3)


@pytest.mark.slow
def test_dynamic_init_recovers_state():
    sim = Simulator(SimParams(seed=5), trajectory=circle_trajectory(duration=14.0))
    (imu_t, imu_w, imu_a), (obs, mask), (R_ItoC, p_IinC), gt = make_window(sim)
    opts = DynamicInitOptions()
    out = solve_dynamic_init(
        jnp.asarray(imu_t), jnp.asarray(imu_w), jnp.asarray(imu_a),
        jnp.asarray(obs), jnp.asarray(mask),
        jnp.asarray(R_ItoC), jnp.asarray(p_IinC), opts,
    )
    p = out["params"]
    # gravity direction in I0 frame: true = R_GtoI0 [0,0,g]
    g_true = gt["R_GtoI0"] @ np.array([0, 0, G])
    g_est = np.asarray(p["g"])
    cos = g_true @ g_est / (np.linalg.norm(g_true) * np.linalg.norm(g_est))
    assert cos > 0.9995, f"gravity direction error {np.degrees(np.arccos(cos)):.2f} deg"
    # v0 in I0 frame: true = R_GtoI0 v0_G
    v0_true = gt["R_GtoI0"] @ gt["v0_G"]
    np.testing.assert_allclose(np.asarray(p["v0"]), v0_true, atol=0.05)
    # biases near zero (noise-free input)
    assert np.linalg.norm(np.asarray(p["bg"])) < 0.01
    assert float(out["rmse_norm"]) < 1e-3

    # mapping to a filter state: velocity magnitude & gravity alignment
    st = result_to_state(p, jnp.asarray(imu_t), jnp.asarray(imu_w), jnp.asarray(imu_a), opts)
    np.testing.assert_allclose(
        np.linalg.norm(st["v"]), np.linalg.norm(gt["vP_G"]), atol=0.05
    )
    R_est = np.asarray(quat_to_rot(jnp.asarray(st["q_GtoI"])))
    # gravity-aligned: third row of R_GtoIP maps e3; compare accel dirs
    z_est = R_est @ np.array([0, 0, 1.0])
    z_true = gt["R_GtoIP"] @ np.array([0, 0, 1.0])
    assert z_est @ z_true > 0.9995


@pytest.mark.slow
def test_dynamic_init_with_noise():
    # dynamic init needs real excitation (the reference gates on an accel
    # jerk before attempting it) — use an aggressive lap
    sim = Simulator(
        SimParams(seed=5), trajectory=circle_trajectory(duration=14.0, lap_s=8.0)
    )
    (imu_t, imu_w, imu_a), (obs, mask), (R_ItoC, p_IinC), gt = make_window(
        sim, noise=True
    )
    opts = DynamicInitOptions(gn_iters=15)
    out = solve_dynamic_init(
        jnp.asarray(imu_t), jnp.asarray(imu_w), jnp.asarray(imu_a),
        jnp.asarray(obs), jnp.asarray(mask),
        jnp.asarray(R_ItoC), jnp.asarray(p_IinC), opts,
    )
    p = out["params"]
    g_true = gt["R_GtoI0"] @ np.array([0, 0, G])
    cos = (g_true @ np.asarray(p["g"])) / (G * np.linalg.norm(np.asarray(p["g"])))
    assert cos > 0.999, f"gravity err {np.degrees(np.arccos(min(cos,1))):.2f} deg"
    v0_true = gt["R_GtoI0"] @ gt["v0_G"]
    # velocity to ~15% under realistic noise (the filter refines from here)
    assert np.linalg.norm(np.asarray(p["v0"]) - v0_true) < 0.25


@pytest.mark.slow
def test_dynamic_init_end_to_end():
    """Moving-from-start sequence: dynamic init fires, window replays,
    and the filter tracks (posyaw ATE bounded)."""
    from uvio_tpu.eval import ate
    from uvio_tpu.manager import CameraConfig, VioConfig, VioManager

    sim = Simulator(
        SimParams(seed=11), trajectory=circle_trajectory(duration=24.0, lap_s=8.0)
    )
    cam = sim.params.cameras[0]
    cfg = VioConfig(
        max_clones=11, sigma_pix=1.0, use_static_init=True, use_dynamic_init=True,
        max_slam=15,
        cameras=[CameraConfig(model=cam.model, intrinsics=cam.intrinsics,
                              q_ItoC=cam.q_ItoC, p_IinC=cam.p_IinC)],
    )
    mgr = VioManager(cfg)
    est = {"t": [], "q": [], "p": []}
    gts = {"q": [], "p": []}
    init_t = None
    tc = 0.0
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
            if mgr.is_initialized:
                if init_t is None:
                    init_t = tc
                est["t"].append(tc)
                est["q"].append(np.asarray(mgr.state.q))
                est["p"].append(np.asarray(mgr.state.p))
                g = sim.get_gt_state(tc)
                gts["q"].append(g["q_GtoI"])
                gts["p"].append(g["p_IinG"])
        if init_t and tc - init_t > 12:
            break
    assert init_t is not None, "dynamic init never fired"
    assert init_t - sim.t_start < 5.0
    res = ate(
        np.asarray(est["t"]), np.asarray(est["q"]), np.asarray(est["p"]),
        np.asarray(est["t"]), np.asarray(gts["q"]), np.asarray(gts["p"]),
        method="posyaw",
    )
    assert res["rmse_pos"] < 0.25, res["rmse_pos"]


def test_cpi_v1_closed_form_matches_groundtruth():
    """CpiV1 closed forms (`cpi/CpiV1.cpp`) against the same sim
    groundtruth checks as the midpoint scheme — and tighter on COARSE
    intervals, where the closed form is exact under piecewise-constant
    w/a while midpoint truncates."""
    from uvio_tpu.init.cpi import preintegrate_v1

    sim = Simulator(SimParams(seed=5), trajectory=circle_trajectory(duration=14.0))
    (imu_t, imu_w, imu_a), _, _, gt = make_window(sim, n_pose=2, cam_dt=0.5)
    out = preintegrate_v1(
        jnp.asarray(imu_t[0]), jnp.asarray(imu_w[0]), jnp.asarray(imu_a[0]),
        jnp.zeros(3), jnp.zeros(3),
    )
    expect = gt["R_GtoIP"] @ gt["R_GtoI0"].T
    np.testing.assert_allclose(np.asarray(out["R_k2tau"]), expect, atol=2e-4)
    dt = float(out["dt"])
    g_G = np.array([0, 0, G])
    beta_G = gt["R_GtoI0"].T @ np.asarray(out["beta"])
    vP_pred = gt["v0_G"] - g_G * dt + beta_G
    np.testing.assert_allclose(vP_pred, gt["vP_G"], atol=2e-3)

    # coarse-interval exactness: constant w/a, ONE 0.5 s interval vs a
    # finely-subdivided midpoint integration of the same signal
    from uvio_tpu.init.cpi import preintegrate

    w = np.array([0.9, -0.4, 1.3])
    a = np.array([0.6, 0.2, -0.8])
    T = 0.5
    coarse_t = jnp.asarray([0.0, T])
    tile = lambda v, n: jnp.asarray(np.tile(v, (n, 1)))
    fine_t = jnp.asarray(np.linspace(0.0, T, 2001))
    ref = preintegrate(fine_t, tile(w, 2001), tile(a, 2001), jnp.zeros(3), jnp.zeros(3))
    v1 = preintegrate_v1(coarse_t, tile(w, 2), tile(a, 2), jnp.zeros(3), jnp.zeros(3))
    mid = preintegrate(coarse_t, tile(w, 2), tile(a, 2), jnp.zeros(3), jnp.zeros(3))
    err_v1 = np.linalg.norm(np.asarray(v1["alpha"]) - np.asarray(ref["alpha"]))
    err_mid = np.linalg.norm(np.asarray(mid["alpha"]) - np.asarray(ref["alpha"]))
    assert err_v1 < 1e-6, err_v1          # closed form: exact
    assert err_mid > 10 * err_v1, err_mid  # midpoint: truncation error


def test_cpi_v2_gravity_in_integral():
    """CpiV2 (`cpi/CpiV2.cpp`): gravity folded into alpha/beta, so
    shooting without explicit g terms reproduces the V1 shooting."""
    from uvio_tpu.init.cpi import preintegrate_v1, preintegrate_v2

    rng = np.random.default_rng(2)
    n = 101
    T = 0.5
    t = jnp.asarray(np.linspace(0.0, T, n))
    w = jnp.asarray(0.4 * rng.standard_normal(3) + np.zeros((n, 3)))
    a = jnp.asarray(np.array([0.3, -0.2, 9.9]) + 0.1 * rng.standard_normal((n, 3)))
    from scipy.spatial.transform import Rotation as Rsp

    R_GtoI0 = Rsp.from_euler("xyz", [8, -4, 30], degrees=True).as_matrix()
    g = jnp.asarray([0.0, 0.0, G])
    v1 = preintegrate_v1(t, w, a, jnp.zeros(3), jnp.zeros(3))
    v2 = preintegrate_v2(t, w, a, jnp.zeros(3), jnp.zeros(3), jnp.asarray(R_GtoI0), g)
    # same relative rotation
    np.testing.assert_allclose(
        np.asarray(v1["R_k2tau"]), np.asarray(v2["R_k2tau"]), atol=1e-12
    )
    # p via V1: p0 + v0 T - 0.5 g T^2 + R0^T alpha1 (global frame)
    # p via V2: p0 + v0 T + R0^T alpha2
    dT = float(v1["dt"])
    lhs = -0.5 * np.asarray(g) * dT * dT + R_GtoI0.T @ np.asarray(v1["alpha"])
    rhs = R_GtoI0.T @ np.asarray(v2["alpha"])
    np.testing.assert_allclose(lhs, rhs, atol=2e-5)
    lhs_v = -np.asarray(g) * dT + R_GtoI0.T @ np.asarray(v1["beta"])
    rhs_v = R_GtoI0.T @ np.asarray(v2["beta"])
    np.testing.assert_allclose(lhs_v, rhs_v, atol=2e-5)


def test_cpi_v1_autodiff_bias_jacobians():
    """jacfwd through the closed form == finite differences (replaces
    the reference's ~200 lines of hand-derived J_q/J_a/J_b/H_a/H_b)."""
    import jax

    from uvio_tpu.init.cpi import preintegrate_v1

    rng = np.random.default_rng(3)
    n = 21
    t = jnp.asarray(np.linspace(0.0, 0.1, n))
    w = jnp.asarray(0.5 * rng.standard_normal((n, 3)))
    a = jnp.asarray(np.array([0, 0, 9.81]) + rng.standard_normal((n, 3)))

    def f(bg, ba):
        out = preintegrate_v1(t, w, a, bg, ba)
        return jnp.concatenate([out["alpha"], out["beta"]])

    J_bg = np.asarray(jax.jacfwd(f, argnums=0)(jnp.zeros(3), jnp.zeros(3)))
    J_ba = np.asarray(jax.jacfwd(f, argnums=1)(jnp.zeros(3), jnp.zeros(3)))
    eps = 1e-6
    for k in range(3):
        e = np.zeros(3); e[k] = eps
        fd_bg = (np.asarray(f(jnp.asarray(e), jnp.zeros(3))) - np.asarray(f(jnp.zeros(3), jnp.zeros(3)))) / eps
        fd_ba = (np.asarray(f(jnp.zeros(3), jnp.asarray(e))) - np.asarray(f(jnp.zeros(3), jnp.zeros(3)))) / eps
        np.testing.assert_allclose(J_bg[:, k], fd_bg, atol=1e-4)
        np.testing.assert_allclose(J_ba[:, k], fd_ba, atol=1e-4)


@pytest.mark.slow
def test_dynamic_init_with_cpi_v1():
    """The full MLE solves with the closed-form model selected."""
    sim = Simulator(SimParams(seed=5), trajectory=circle_trajectory(duration=14.0))
    (imu_t, imu_w, imu_a), (obs, mask), (R_ItoC, p_IinC), gt = make_window(sim)
    opts = DynamicInitOptions(cpi_model="cpi_v1")
    out = solve_dynamic_init(
        jnp.asarray(imu_t), jnp.asarray(imu_w), jnp.asarray(imu_a),
        jnp.asarray(obs), jnp.asarray(mask),
        jnp.asarray(R_ItoC), jnp.asarray(p_IinC), opts,
    )
    assert float(out["rmse_norm"]) < opts.max_reproj_rmse
    g_I0 = np.asarray(out["params"]["g"])
    g_true = gt["R_GtoI0"] @ np.array([0, 0, G])
    cos = g_I0 @ g_true / (np.linalg.norm(g_I0) * np.linalg.norm(g_true))
    assert cos > 0.9999, cos
