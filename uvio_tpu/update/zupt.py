"""Zero-velocity update (ZUPT).

Equivalent of `ov_msckf/src/update/UpdaterZeroVelocity.{h,cpp}`: stack
per-IMU-sample residuals

    r_w = w_m - bg              (gyro says not rotating)
    r_a = a_m - ba - R_GtoI g   (accel says only gravity)

over the padded IMU batch, with Jacobians into [theta, bg, ba], whiten
by the (noise-multiplied) continuous noise, chi2-test plus a velocity
norm test, and if accepted apply the EKF update and tell the manager to
*skip* propagation/cloning for this frame (the reference's early-return
path, `UpdaterZeroVelocity.cpp:65-330`; the image-disparity variant is
host-side in the manager).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..filter.ekf import ekf_update
from ..filter.propagator import NoiseManager
from ..math import quat_to_rot, skew
from ..math.chi2 import chi2_95
from ..types.layout import StateLayout
from ..types.state import FilterState


def zupt_try_update(
    state: FilterState,
    layout: StateLayout,
    imu_t: jnp.ndarray,
    imu_w: jnp.ndarray,
    imu_a: jnp.ndarray,
    noises: NoiseManager,
    gravity_mag: float,
    chi2_mult: float = 1.0,
    noise_mult: float = 10.0,
    max_velocity: float = 0.1,
    stamp_time: jnp.ndarray = None,
):
    """Returns (new_state, accepted, chi2). Applies the update only when
    the chi2 + velocity gates pass (lax.cond inside). `stamp_time` is
    the camera-clock frame time stored on accept (imu_t spans the
    offset-shifted IMU-clock window when dt calibration is active)."""
    L = layout
    D = L.dim
    dtype = state.cov.dtype
    imu_w = imu_w.astype(dtype)
    imu_a = imu_a.astype(dtype)
    M = imu_t.shape[0]
    dts = jnp.diff(imu_t)
    valid = dts > 0
    n_valid = jnp.sum(valid) + 1
    dt_avg = jnp.sum(jnp.where(valid, dts, 0.0)) / jnp.maximum(jnp.sum(valid), 1)

    gravity = jnp.array([0.0, 0.0, gravity_mag], dtype=dtype)
    R = quat_to_rot(state.q_fej)
    Rg = R @ gravity

    # rows: per sample [r_w(3); r_a(3)]
    r_w = imu_w - state.bg[None, :]
    r_a = imu_a - state.ba[None, :] - Rg[None, :]
    smask = jnp.concatenate([jnp.array([True]), valid])  # first sample + valid steps

    H_one = jnp.zeros((6, D), dtype)
    H_one = H_one.at[3:6, L.theta_off : L.theta_off + 3].set(-skew(Rg))
    H_one = H_one.at[0:3, L.bg_off : L.bg_off + 3].set(-jnp.eye(3, dtype=dtype))
    H_one = H_one.at[3:6, L.ba_off : L.ba_off + 3].set(-jnp.eye(3, dtype=dtype))

    H = jnp.tile(H_one, (M, 1))  # (6M, D)
    res = jnp.concatenate([r_w, r_a], axis=1).reshape(-1)  # (6M,)
    safe_dt = jnp.where(dt_avg > 0, dt_avg, 1.0)
    sig_w2 = noise_mult * noises.sigma_w**2 / safe_dt
    sig_a2 = noise_mult * noises.sigma_a**2 / safe_dt
    r_diag = jnp.tile(
        jnp.concatenate([jnp.full(3, sig_w2, dtype), jnp.full(3, sig_a2, dtype)]), M
    )
    rmask = jnp.repeat(smask, 6)
    Hm = H * rmask[:, None]
    rm = res * rmask

    # chi2 over the full stacked system
    PHt = state.cov @ Hm.T
    S = Hm @ PHt + jnp.diag(jnp.where(rmask, r_diag, 1.0))
    chol = jax.scipy.linalg.cho_factor(0.5 * (S + S.T), lower=True)
    gamma = rm @ jax.scipy.linalg.cho_solve(chol, rm)
    dof = 6 * n_valid
    accept = (gamma < chi2_mult * chi2_95(dof, max_dof=6 * M)) & (
        jnp.linalg.norm(state.v) < max_velocity
    )

    def do(st):
        new_st, _ = ekf_update(st, L, Hm, rm, r_diag, rmask)
        return new_st.replace(
            time=imu_t[-1] if stamp_time is None else stamp_time
        )

    new_state = jax.lax.cond(accept, do, lambda s: s, state)
    return new_state, accept, gamma
