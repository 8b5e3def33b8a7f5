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


def _inertial_system(state, layout, imu_t, imu_w, imu_a, noises, gravity_mag, noise_mult):
    """Stacked zero-motion inertial residual system over the padded IMU
    batch. Returns (Hm, rm, r_diag, rmask, dof, max_dof)."""
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
    return H * rmask[:, None], res * rmask, r_diag, rmask, 6 * n_valid, 6 * M


def _gate(state, Hm, rm, r_diag, rmask, dof, max_dof, chi2_mult, max_velocity):
    """chi2 + velocity-norm acceptance gate. Returns (accept, gamma)."""
    PHt = state.cov @ Hm.T
    S = Hm @ PHt + jnp.diag(jnp.where(rmask, r_diag, 1.0))
    chol = jax.scipy.linalg.cho_factor(0.5 * (S + S.T), lower=True)
    gamma = rm @ jax.scipy.linalg.cho_solve(chol, rm)
    accept = (gamma < chi2_mult * chi2_95(dof, max_dof=max_dof)) & (
        jnp.linalg.norm(state.v) < max_velocity
    )
    return accept, gamma


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
    Hm, rm, r_diag, rmask, dof, max_dof = _inertial_system(
        state, L, imu_t, imu_w, imu_a, noises, gravity_mag, noise_mult
    )
    accept, gamma = _gate(
        state, Hm, rm, r_diag, rmask, dof, max_dof, chi2_mult, max_velocity
    )

    def do(st):
        new_st, _ = ekf_update(st, L, Hm, rm, r_diag, rmask)
        return new_st.replace(
            time=imu_t[-1] if stamp_time is None else stamp_time
        )

    new_state = jax.lax.cond(accept, do, lambda s: s, state)
    return new_state, accept, gamma


def zupt_explicit_update(
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
    integration: str = "rk4",
):
    """Explicit zero-motion variant (`UpdaterZeroVelocity.cpp:283-330`,
    `explicitly_enforce_zero_motion`): gate exactly like the inertial
    variant, but on accept PROPAGATE mean+cov through the IMU window and
    constrain the propagated IMU pose to the newest clone with a 9-dof
    pseudo-measurement [log(R_I R_c^T); p_I - p_c; v] = 0.

    The reference clones at the new time, constrains the clone pair, and
    immediately marginalizes the new clone; constraining the propagated
    IMU state against the newest clone is the same measurement without
    the transient slot traffic (static-slot friendly). Falls back to the
    inertial update when no clone exists yet.

    Returns (new_state, accepted, chi2).
    """
    from ..filter.propagator import propagate_mean_cov
    from ..math import log_so3

    L = layout
    D = L.dim
    dtype = state.cov.dtype
    Hm, rm, r_diag, rmask, dof, max_dof = _inertial_system(
        state, L, imu_t, imu_w, imu_a, noises, gravity_mag, noise_mult
    )
    accept_gate, gamma = _gate(
        state, Hm, rm, r_diag, rmask, dof, max_dof, chi2_mult, max_velocity
    )
    has_clone = state.clone_head >= 0

    def do_explicit(st):
        st, _ = propagate_mean_cov(
            st, L, imu_t, imu_w, imu_a, noises, gravity_mag,
            integration=integration, stamp_time=stamp_time,
        )
        slot = jnp.maximum(st.clone_head, 0)
        qc = st.clones_q[slot]
        pc = st.clones_p[slot]
        R_I = quat_to_rot(st.q)
        R_c = quat_to_rot(qc)
        # res = 0 - h with h = [log(R_I R_c^T); p_I - p_c; v]
        res = jnp.concatenate(
            [-log_so3(R_I @ R_c.T), -(st.p - pc), -st.v]
        ).astype(dtype)
        # Jacobians at FEJ (error convention R = (I - [th]x) R_hat):
        # dh_ori/dth_I = -I, dh_ori/dth_c = R_I R_c^T (~= I at zero motion)
        R_If = quat_to_rot(st.q_fej)
        R_cf = quat_to_rot(st.clones_q_fej[slot])
        D_hat = (R_If @ R_cf.T).astype(dtype)
        I3 = jnp.eye(3, dtype=dtype)
        H = jnp.zeros((9, D), dtype)
        H = H.at[0:3, L.theta_off : L.theta_off + 3].set(-I3)
        H = H.at[3:6, L.p_off : L.p_off + 3].set(I3)
        H = H.at[6:9, L.v_off : L.v_off + 3].set(I3)
        coff = jnp.asarray(L.clone_slot_off(slot), jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        H = jax.lax.dynamic_update_slice(H, D_hat, (zero, coff))
        H = jax.lax.dynamic_update_slice(H, -I3, (zero + 3, coff + 3))
        # noise (ori, pos, vel) — reference's fixed pseudo-noise
        r9 = jnp.concatenate(
            [jnp.full(3, 1e-2**2, dtype), jnp.full(3, 1e-1**2, dtype),
             jnp.full(3, 1e-1**2, dtype)]
        )
        new_st, _ = ekf_update(st, L, H, res, r9, jnp.ones(9, bool))
        return new_st

    def do_inertial(st):
        new_st, _ = ekf_update(st, L, Hm, rm, r_diag, rmask)
        return new_st.replace(
            time=imu_t[-1] if stamp_time is None else stamp_time
        )

    new_state = jax.lax.cond(
        accept_gate,
        lambda s: jax.lax.cond(has_clone, do_explicit, do_inertial, s),
        lambda s: s,
        state,
    )
    return new_state, accept_gate, gamma
