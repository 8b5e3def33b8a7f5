"""IMU propagation as a fused scan.

TPU-native equivalent of `ov_msckf/src/state/Propagator.{h,cpp}`:
the per-sample loop (`Propagator.cpp:83-99` predict_and_compute with
Phi/Qd product-sum accumulation) becomes one `lax.scan` over a padded
IMU batch; boundary interpolation (`select_imu_readings`) happens on the
host (pure data plumbing).

Mean integration: RK4 over the IMU kinematics (predict_mean_rk4,
`Propagator.cpp:507-620`); error-state transition: the discrete
closed-form F/G (`compute_F_and_G_discrete`, `Propagator.cpp:830-960`,
without IMU-intrinsic calib blocks) evaluated with averaged w/a and
first-estimate (FEJ) linearization points.

Padded samples carry dt=0 and contribute exactly F=I, Qd=0.

Error order within the 15-dof IMU block: theta p v bg ba.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..math import exp_so3, jr_so3, log_so3, omega, quat_multiply, quat_norm, quat_to_rot, skew
from ..types.layout import IMU_MODEL_KALIBR, StateLayout
from ..types.state import FilterState
from .ekf import augment_clone, propagate_covariance


# ---------------------------------------------------------------------------
# IMU intrinsics (State::Dm / State::Tg, `State.h:91-135`)
# ---------------------------------------------------------------------------


def dm_matrix(vec, imu_model: int):
    """3x3 scale/misalignment matrix from its 6-vector.

    KALIBR fills the lower triangle column-wise, RPNG the upper
    triangle (`State::Dm`)."""
    z = jnp.zeros((), vec.dtype)
    if imu_model == IMU_MODEL_KALIBR:
        rows = [
            jnp.stack([vec[0], z, z]),
            jnp.stack([vec[1], vec[3], z]),
            jnp.stack([vec[2], vec[4], vec[5]]),
        ]
    else:
        rows = [
            jnp.stack([vec[0], vec[1], vec[3]]),
            jnp.stack([z, vec[2], vec[4]]),
            jnp.stack([z, z, vec[5]]),
        ]
    return jnp.stack(rows)


def tg_matrix(vec):
    """3x3 gravity-sensitivity matrix, column-wise fill (`State::Tg`)."""
    return vec.reshape(3, 3).T


def _h_dm(v, imu_model: int, dtype):
    """d(Dm @ v)/d(vec) — (3, 6) (`Propagator::compute_H_Dw/H_Da`)."""
    z = jnp.zeros((), dtype)
    if imu_model == IMU_MODEL_KALIBR:
        # cols: v1*I3 | v2*e2 | v2*e3 | v3*e3
        rows = [
            jnp.stack([v[0], z, z, z, z, z]),
            jnp.stack([z, v[0], z, v[1], z, z]),
            jnp.stack([z, z, v[0], z, v[1], v[2]]),
        ]
    else:
        # cols: v1*e1 | v2*e1 | v2*e2 | v3*I3
        rows = [
            jnp.stack([v[0], v[1], z, v[2], z, z]),
            jnp.stack([z, z, v[1], z, v[2], z]),
            jnp.stack([z, z, z, z, z, v[2]]),
        ]
    return jnp.stack(rows)


def _h_tg(a, dtype):
    """d(Tg @ a)/d(vec) — (3, 9) = [a1*I3, a2*I3, a3*I3]
    (`Propagator::compute_H_Tg`)."""
    eye3 = jnp.eye(3, dtype=dtype)
    return jnp.concatenate([a[0] * eye3, a[1] * eye3, a[2] * eye3], axis=1)


@dataclasses.dataclass(frozen=True)
class NoiseManager:
    """Continuous-time IMU noise sigmas (`ov_core` NoiseManager)."""

    sigma_w: float = 1.6968e-04  # gyro white noise (rad/s/sqrt(hz))
    sigma_wb: float = 1.9393e-05  # gyro bias walk
    sigma_a: float = 2.0000e-3  # accel white noise
    sigma_ab: float = 3.0000e-03  # accel bias walk


def _rk4_mean(q, p, v, w1, a1, w2, a2, dt, gravity):
    """RK4 integration of q_GtoI, p, v (predict_mean_rk4 behavior)."""
    safe_dt = jnp.where(dt > 0, dt, 1.0)
    w_alpha = (w2 - w1) / safe_dt
    a_jerk = (a2 - a1) / safe_dt

    q0 = q

    def deriv(dq, vv, w_hat, a_hat):
        q_dot = 0.5 * omega(w_hat) @ dq
        R_Gto = quat_to_rot(quat_multiply(dq, q0))
        v_dot = R_Gto.T @ a_hat - gravity
        return q_dot, vv, v_dot

    dq0 = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=q.dtype)
    # k1
    k1_q, k1_p, k1_v = deriv(dq0, v, w1, a1)
    # k2 (midpoint)
    w_mid = w1 + 0.5 * w_alpha * dt
    a_mid = a1 + 0.5 * a_jerk * dt
    dq1 = quat_norm(dq0 + 0.5 * k1_q * dt)
    k2_q, k2_p, k2_v = deriv(dq1, v + 0.5 * k1_v * dt, w_mid, a_mid)
    # k3
    dq2 = quat_norm(dq0 + 0.5 * k2_q * dt)
    k3_q, k3_p, k3_v = deriv(dq2, v + 0.5 * k2_v * dt, w_mid, a_mid)
    # k4
    dq3 = quat_norm(dq0 + k3_q * dt)
    k4_q, k4_p, k4_v = deriv(dq3, v + k3_v * dt, w2, a2)

    dq = quat_norm(dq0 + (dt / 6.0) * (k1_q + 2 * k2_q + 2 * k3_q + k4_q))
    new_q = quat_multiply(dq, q0)
    new_p = p + (dt / 6.0) * (k1_p + 2 * k2_p + 2 * k3_p + k4_p)
    new_v = v + (dt / 6.0) * (k1_v + 2 * k2_v + 2 * k3_v + k4_v)
    return new_q, new_p, new_v


def _f_and_g_discrete(
    R_k,
    p_k,
    v_k,
    new_q,
    new_p,
    new_v,
    w_hat,
    a_hat,
    dt,
    gravity,
    dtype,
    layout: StateLayout = None,
    intr=None,
):
    """F (15, 15+s) and G (15, 12) (compute_F_and_G_discrete,
    `Propagator.cpp:830-960`), s = layout.imu_intr_dim.

    R_k/p_k/v_k are the FEJ linearization points of the *start* state.
    `intr`, when intrinsic calibration is on, is a dict with the
    correction matrices and uncorrected/corrected readings:
    RwDw (=R_GYROtoIMU @ Dw), RaDa, R_w, R_a, Tg, w_unc, a_unc, w_k, a_k.
    """
    eye3 = jnp.eye(3, dtype=dtype)
    R_new = quat_to_rot(new_q)
    dR = R_new @ R_k.T
    Jr = jr_so3(log_so3(dR))
    dRJrdt = dR @ Jr * dt

    if intr is None:
        RwDw = RaDa = eye3
        TgM = jnp.zeros((3, 3), dtype=dtype)
    else:
        RwDw, RaDa, TgM = intr["RwDw"], intr["RaDa"], intr["Tg"]

    s = 0 if layout is None else layout.imu_intr_dim
    F = jnp.zeros((15, 15 + s), dtype=dtype)
    # theta rows
    F = F.at[0:3, 0:3].set(dR)
    F = F.at[0:3, 9:12].set(-dRJrdt @ RwDw)
    F = F.at[0:3, 12:15].set(dRJrdt @ RwDw @ TgM @ RaDa)
    # position rows
    F = F.at[3:6, 0:3].set(
        -skew(new_p - p_k - v_k * dt + 0.5 * gravity * dt * dt) @ R_k.T
    )
    F = F.at[3:6, 3:6].set(eye3)
    F = F.at[3:6, 6:9].set(eye3 * dt)
    F = F.at[3:6, 12:15].set(-0.5 * dt * dt * R_k.T @ RaDa)
    # velocity rows
    F = F.at[6:9, 0:3].set(-skew(new_v - v_k + gravity * dt) @ R_k.T)
    F = F.at[6:9, 6:9].set(eye3)
    F = F.at[6:9, 12:15].set(-dt * R_k.T @ RaDa)
    # bias rows
    F = F.at[9:12, 9:12].set(eye3)
    F = F.at[12:15, 12:15].set(eye3)

    if s > 0:
        L = layout
        model = L.imu_model
        H_Dw = _h_dm(intr["w_unc"], model, dtype)
        H_Da = _h_dm(intr["a_unc"], model, dtype)
        dw0, da0 = L.imu_dw_off, L.imu_da_off
        F = F.at[0:3, dw0 : dw0 + 6].set(dRJrdt @ intr["R_w"] @ H_Dw)
        # NB the reference omits Dw in this block
        # (`Propagator.cpp:934` uses R_wtoI*Tg*R_atoI*H_Da); we keep the
        # exact chain rule d(w_I)/d(Da) = -R_w Dw Tg R_a H_Da.
        F = F.at[0:3, da0 : da0 + 6].set(-dRJrdt @ RwDw @ TgM @ intr["R_a"] @ H_Da)
        F = F.at[3:6, da0 : da0 + 6].set(0.5 * dt * dt * R_k.T @ intr["R_a"] @ H_Da)
        F = F.at[6:9, da0 : da0 + 6].set(dt * R_k.T @ intr["R_a"] @ H_Da)
        if L.calib_imu_g_sensitivity:
            tg0 = L.imu_tg_off
            F = F.at[0:3, tg0 : tg0 + 9].set(-dRJrdt @ RwDw @ _h_tg(intr["a_k"], dtype))
        th0 = L.imu_theta_off
        if model == IMU_MODEL_KALIBR:
            # gyro-to-IMU rotation error
            F = F.at[0:3, th0 : th0 + 3].set(dRJrdt @ skew(intr["w_k"]))
        else:
            # acc-to-IMU rotation error
            F = F.at[0:3, th0 : th0 + 3].set(-dRJrdt @ RwDw @ TgM @ skew(intr["a_k"]))
            F = F.at[3:6, th0 : th0 + 3].set(0.5 * dt * dt * R_k.T @ skew(intr["a_k"]))
            F = F.at[6:9, th0 : th0 + 3].set(dt * R_k.T @ skew(intr["a_k"]))
        # intrinsics rows themselves are identity, handled by the
        # caller's Phi recursion (they never change).

    G = jnp.zeros((15, 12), dtype=dtype)
    G = G.at[0:3, 0:3].set(-dRJrdt @ RwDw)
    G = G.at[0:3, 3:6].set(dRJrdt @ RwDw @ TgM @ RaDa)
    G = G.at[3:6, 3:6].set(-0.5 * dt * dt * R_k.T @ RaDa)
    G = G.at[6:9, 3:6].set(-dt * R_k.T @ RaDa)
    G = G.at[9:12, 6:9].set(eye3 * dt)
    G = G.at[12:15, 9:12].set(eye3 * dt)
    return F, G


def propagate_mean_cov(
    state: FilterState,
    layout: StateLayout,
    imu_t: jnp.ndarray,
    imu_w: jnp.ndarray,
    imu_a: jnp.ndarray,
    noises: NoiseManager,
    gravity_mag: float,
):
    """Propagate mean+covariance through a padded IMU batch.

    imu_t (M,), imu_w (M,3), imu_a (M,3); intervals are consecutive
    sample pairs; padding = repeated timestamps (dt==0 -> identity).
    Returns (new_state, w_hat_last) where w_hat_last is the bias-
    corrected angular velocity at the end (for the clone dt Jacobian).
    """
    dtype = state.cov.dtype
    gravity = jnp.array([0.0, 0.0, gravity_mag], dtype=dtype)
    bg, ba = state.bg, state.ba
    # time axis stays f64; compute in the state dtype
    imu_w = imu_w.astype(dtype)
    imu_a = imu_a.astype(dtype)

    # IMU intrinsic correction matrices (identity unless seeded/estimated):
    #   a_I = R_AtoI Da (a_m - ba);  w_I = R_WtoI Dw (w_m - bg - Tg a_I)
    # (`Propagator.cpp:403-429`)
    model = layout.imu_model
    Dw = dm_matrix(state.calib_imu_dw.astype(dtype), model)
    Da = dm_matrix(state.calib_imu_da.astype(dtype), model)
    TgM = tg_matrix(state.calib_imu_tg.astype(dtype))
    R_w = quat_to_rot(state.calib_imu_gq.astype(dtype))
    R_a = quat_to_rot(state.calib_imu_aq.astype(dtype))
    RwDw = R_w @ Dw
    RaDa = R_a @ Da
    s = layout.imu_intr_dim

    q0, p0, v0 = state.q, state.p, state.v
    Rf0 = quat_to_rot(state.q_fej)
    pf0, vf0 = state.p_fej, state.v_fej

    def body(carry, inp):
        q, p, v, R_fej, p_fej, v_fej, Phi, Qd = carry
        t1, w1m, a1m, t2, w2m, a2m = inp
        dt = (t2 - t1).astype(dtype)
        has = dt > 0
        safe_dt = jnp.where(has, dt, 1.0)
        a1 = RaDa @ (a1m - ba)
        a2 = RaDa @ (a2m - ba)
        w1u = w1m - bg - TgM @ a1
        w2u = w2m - bg - TgM @ a2
        w1 = RwDw @ w1u
        w2 = RwDw @ w2u
        w_hat = 0.5 * (w1 + w2)
        a_hat = 0.5 * (a1 + a2)

        new_q, new_p, new_v = _rk4_mean(q, p, v, w1, a1, w2, a2, dt, gravity)
        new_q = jnp.where(has, new_q, q)
        new_p = jnp.where(has, new_p, p)
        new_v = jnp.where(has, new_v, v)

        intr = {
            "RwDw": RwDw,
            "RaDa": RaDa,
            "R_w": R_w,
            "R_a": R_a,
            "Tg": TgM,
            # uncorrected (bias/gravity-sensitivity removed) averages
            "w_unc": 0.5 * (w1u + w2u),
            "a_unc": 0.5 * ((a1m - ba) + (a2m - ba)),
            # fully corrected averages in the IMU frame
            "w_k": w_hat,
            "a_k": a_hat,
        }

        # FEJ: linearization start is (R_fej, p_fej, v_fej) — which only
        # differs from the value on the first interval after an EKF
        # update; the endpoint is the value-propagated mean. This matches
        # the reference, which sets value==fej after every interval
        # (`Propagator.cpp:473-479`).
        F, G = _f_and_g_discrete(
            R_fej,
            p_fej,
            v_fej,
            new_q,
            new_p,
            new_v,
            w_hat,
            a_hat,
            safe_dt,
            gravity,
            dtype,
            layout=layout,
            intr=intr,
        )
        eye = jnp.eye(15, 15 + s, dtype=dtype)
        F = jnp.where(has, F, eye)
        G = jnp.where(has, G, jnp.zeros_like(G))

        qc = jnp.concatenate(
            [
                jnp.full((3,), noises.sigma_w**2, dtype) / safe_dt,
                jnp.full((3,), noises.sigma_a**2, dtype) / safe_dt,
                jnp.full((3,), noises.sigma_wb**2, dtype) / safe_dt,
                jnp.full((3,), noises.sigma_ab**2, dtype) / safe_dt,
            ]
        )
        Qd_i = (G * qc[None, :]) @ G.T
        Qd_i = 0.5 * (Qd_i + Qd_i.T)

        # Phi over the contiguous [imu(15) | intr(s)] block is
        # [[Phi_ii, Phi_ik], [0, I]]; only the top (15, 15+s) rows are
        # carried (the intrinsics rows are constant identity):
        #   Phi_ii' = F_ii Phi_ii ;  Phi_ik' = F_ii Phi_ik + F_ik
        F_ii = F[:, :15]
        new_Phi = F_ii @ Phi
        if s > 0:
            new_Phi = new_Phi.at[:, 15:].add(F[:, 15:])
        new_Qd = F_ii @ Qd @ F_ii.T + Qd_i
        # after each interval fej == value (reference behavior)
        return (
            new_q,
            new_p,
            new_v,
            quat_to_rot(new_q),
            new_p,
            new_v,
            new_Phi,
            new_Qd,
        ), w2

    inps = (
        imu_t[:-1],
        imu_w[:-1],
        imu_a[:-1],
        imu_t[1:],
        imu_w[1:],
        imu_a[1:],
    )
    init = (
        q0,
        p0,
        v0,
        Rf0,
        pf0,
        vf0,
        jnp.eye(15, 15 + s, dtype=dtype),
        jnp.zeros((15, 15), dtype=dtype),
    )
    (q, p, v, _, _, _, Phi, Qd), w_hats = jax.lax.scan(body, init, inps)

    cov = propagate_covariance(state.cov, Phi, Qd)
    new_state = state.replace(
        q=q,
        p=p,
        v=v,
        q_fej=q,
        p_fej=p,
        v_fej=v,
        cov=cov,
        time=imu_t[-1],
    )
    return new_state, w_hats[-1]


def propagate_mean_only(
    state, imu_t, imu_w, imu_a, gravity_mag: float, imu_model: int = IMU_MODEL_KALIBR
):
    """Mean-only RK4 propagation (no covariance) — the
    `fast_state_propagate` path for IMU-rate odometry output
    (`Propagator.cpp:140-267`). Returns (q, p, v) at imu_t[-1]."""
    dtype = state.cov.dtype
    gravity = jnp.array([0.0, 0.0, gravity_mag], dtype=dtype)
    bg, ba = state.bg, state.ba
    imu_w = imu_w.astype(dtype)
    imu_a = imu_a.astype(dtype)
    RwDw = quat_to_rot(state.calib_imu_gq.astype(dtype)) @ dm_matrix(
        state.calib_imu_dw.astype(dtype), imu_model
    )
    RaDa = quat_to_rot(state.calib_imu_aq.astype(dtype)) @ dm_matrix(
        state.calib_imu_da.astype(dtype), imu_model
    )
    TgM = tg_matrix(state.calib_imu_tg.astype(dtype))

    def body(carry, inp):
        q, p, v = carry
        t1, w1m, a1m, t2, w2m, a2m = inp
        dt = (t2 - t1).astype(dtype)
        has = dt > 0
        a1 = RaDa @ (a1m - ba)
        a2 = RaDa @ (a2m - ba)
        new_q, new_p, new_v = _rk4_mean(
            q,
            p,
            v,
            RwDw @ (w1m - bg - TgM @ a1),
            a1,
            RwDw @ (w2m - bg - TgM @ a2),
            a2,
            dt,
            gravity,
        )
        return (
            jnp.where(has, new_q, q),
            jnp.where(has, new_p, p),
            jnp.where(has, new_v, v),
        ), None

    (q, p, v), _ = jax.lax.scan(
        body,
        (state.q, state.p, state.v),
        (imu_t[:-1], imu_w[:-1], imu_a[:-1], imu_t[1:], imu_w[1:], imu_a[1:]),
    )
    return q, p, v


def propagate_and_clone(
    state: FilterState,
    layout: StateLayout,
    imu_t: jnp.ndarray,
    imu_w: jnp.ndarray,
    imu_a: jnp.ndarray,
    noises: NoiseManager,
    gravity_mag: float,
) -> FilterState:
    """`Propagator::propagate_and_clone` — propagate to the newest image
    time (imu_t[-1]) then stochastically clone."""
    new_state, w_hat = propagate_mean_cov(
        state, layout, imu_t, imu_w, imu_a, noises, gravity_mag
    )
    return augment_clone(new_state, layout, w_hat)


def select_imu_readings_np(
    times: np.ndarray, ws: np.ndarray, accs: np.ndarray, t0: float, t1: float, m_max: int
):
    """Host-side IMU slicing with boundary interpolation.

    Behavioral equivalent of `Propagator::select_imu_readings` +
    `interpolate_data` (`Propagator.cpp:269-386`): produce the samples
    covering [t0, t1] with linearly interpolated boundary samples, then
    pad (by repeating the last sample) to `m_max` rows.
    Returns (t (m_max,), w (m_max,3), a (m_max,3)).

    Dispatches to the native C++ implementation when built
    (uvio_tpu/native); this numpy body is the fallback and the
    behavioral specification.
    """
    from ..native import select_imu_readings as _native

    out = _native(times, ws, accs, t0, t1, m_max)
    if out is not None:
        return out
    assert t1 > t0, "backwards propagation request"

    def interp(t):
        i = np.searchsorted(times, t)
        i = np.clip(i, 1, len(times) - 1)
        lam = (t - times[i - 1]) / (times[i] - times[i - 1])
        w = (1 - lam) * ws[i - 1] + lam * ws[i]
        a = (1 - lam) * accs[i - 1] + lam * accs[i]
        return w, a

    sel = (times > t0) & (times < t1)
    t_mid = times[sel]
    w_mid = ws[sel]
    a_mid = accs[sel]
    w0, a0 = interp(t0)
    w1, a1 = interp(t1)
    t = np.concatenate([[t0], t_mid, [t1]])
    w = np.concatenate([[w0], w_mid, [w1]])
    a = np.concatenate([[a0], a_mid, [a1]])
    if len(t) > m_max:
        raise ValueError(
            f"IMU batch {len(t)} exceeds max_imu_batch={m_max}; raise the layout limit"
        )
    pad = m_max - len(t)
    t = np.concatenate([t, np.full(pad, t[-1])])
    w = np.concatenate([w, np.tile(w[-1], (pad, 1))])
    a = np.concatenate([a, np.tile(a[-1], (pad, 1))])
    return t, w, a
