"""IMU preintegration for initialization.

Equivalent of the reference's continuous preintegration (`ov_core/src/
cpi/CpiBase.h` / `CpiV1`): relative rotation, velocity (beta) and
position (alpha) preintegrals between two times in the start frame,

    R_k2tau,  beta = int R_k2t a dt,  alpha = int int R_k2t a dt^2

so that with gravity g and start state (R_GtoIk, p_k, v_k):

    p_tau = p_k + v_k dt - 0.5 g dt^2 + R_GtoIk^T alpha
    v_tau = v_k - g dt + R_GtoIk^T beta

Implemented as a `lax.scan` over padded IMU samples; bias Jacobians are
not hand-derived (the reference's J_a/J_b/H_a/H_b) — the dynamic
initializer differentiates *through* this function with jax.jacfwd,
which yields exactly consistent derivatives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..math import exp_so3


def preintegrate(imu_t, imu_w, imu_a, bg, ba):
    """Preintegrate a padded IMU slice (M,)/(M,3).

    Returns dict with R_k2tau (3,3) (rotation start->end frame),
    alpha (3,), beta (3,), dt (scalar). Padded samples (dt==0) are
    identity. Differentiable wrt bg/ba (and the IMU data).
    """
    dtype = imu_w.dtype

    def body(carry, inp):
        R, alpha, beta = carry  # R = R_k2t (start frame -> current frame)
        t1, w1, a1, t2, w2, a2 = inp
        dt = (t2 - t1).astype(dtype)
        has = dt > 0
        w_hat = 0.5 * (w1 + w2) - bg
        a_hat = 0.5 * (a1 + a2) - ba
        # midpoint integration in the start frame
        a_start0 = R.T @ a_hat  # accel rotated into start frame (begin)
        R_new = exp_so3(-w_hat * dt) @ R  # R_k2t convention: R_GtoI_t R_GtoI_k^T... see note
        a_start1 = R_new.T @ a_hat
        a_mid = 0.5 * (a_start0 + a_start1)
        alpha_new = alpha + beta * dt + 0.5 * a_mid * dt * dt
        beta_new = beta + a_mid * dt
        R_out = jnp.where(has, R_new, R)
        return (
            R_out,
            jnp.where(has, alpha_new, alpha),
            jnp.where(has, beta_new, beta),
        ), None

    eye = jnp.eye(3, dtype=dtype)
    init = (eye, jnp.zeros(3, dtype), jnp.zeros(3, dtype))
    inps = (imu_t[:-1], imu_w[:-1], imu_a[:-1], imu_t[1:], imu_w[1:], imu_a[1:])
    (R, alpha, beta), _ = jax.lax.scan(body, init, inps)
    dt_total = imu_t[-1] - imu_t[0]
    return {"R_k2tau": R, "alpha": alpha, "beta": beta, "dt": dt_total.astype(dtype)}


# ---------------------------------------------------------------------------
# Closed-form continuous preintegration (CpiV1 / CpiV2)
# ---------------------------------------------------------------------------
#
# The reference's two analytic models (`ov_core/src/cpi/CpiV1.cpp`,
# `CpiV2.cpp`, Eckenhoff et al. IJRR'19): per interval the alpha/beta
# increments are EXACT under the piecewise-constant assumption —
#   V1: constant w_hat and constant GLOBAL-frame-free a_hat (gravity
#       handled by the consumer's shooting equation),
#   V2: constant w_hat and constant LOCAL gravity-compensated
#       acceleration (gravity folded into the integral via the
#       linearization orientation).
# Where the reference hand-derives ~200 lines of bias Jacobians
# (J_q/J_a/J_b/H_a/H_b), these functions stay differentiable and the
# consumer autodiffs through them (exactly consistent by construction).


def _rot_and_args(w_hat, dt):
    """Closed-form relative rotation + alpha/beta argument matrices for
    one interval (`CpiV1.cpp:76-121` == `CpiV2.cpp:84-119`)."""
    dtype = w_hat.dtype
    eye = jnp.eye(3, dtype=dtype)
    wx = _skew(w_hat)
    wx2 = wx @ wx
    mag = jnp.linalg.norm(w_hat)
    small = mag < 0.008726646
    safe = jnp.where(small, 1.0, mag)
    wdt = mag * dt
    s, c = jnp.sin(wdt), jnp.cos(wdt)
    R_rel = jnp.where(
        small,
        eye - dt * wx + (dt * dt / 2.0) * wx2,
        eye - (s / safe) * wx + ((1.0 - c) / safe**2) * wx2,
    )
    f1 = jnp.where(small, -(dt**3) / 3.0, (wdt * c - s) / safe**3)
    f2 = jnp.where(
        small, (dt**4) / 8.0, (wdt**2 - 2.0 * c - 2.0 * wdt * s + 2.0) / (2.0 * safe**4)
    )
    f3 = jnp.where(small, -(dt * dt) / 2.0, -(1.0 - c) / safe**2)
    f4 = jnp.where(small, (dt**3) / 6.0, (wdt - s) / safe**3)
    alpha_arg = (dt * dt / 2.0) * eye + f1 * wx + f2 * wx2
    beta_arg = dt * eye + f3 * wx + f4 * wx2
    return R_rel, alpha_arg, beta_arg


def _skew(v):
    from ..math import skew

    return skew(v)


def preintegrate_v1(imu_t, imu_w, imu_a, bg, ba, imu_avg=True):
    """CpiV1 closed-form preintegration (`CpiV1.cpp:33-135`).

    Same contract as `preintegrate` (alpha/beta exclude gravity; the
    shooting equation subtracts 0.5 g dt^2 / g dt), but each interval's
    increment is the exact integral under piecewise-constant w/a.
    """
    dtype = imu_w.dtype

    def body(carry, inp):
        R, alpha, beta = carry
        t1, w1, a1, t2, w2, a2 = inp
        dt = (t2 - t1).astype(dtype)
        has = dt > 0
        w_hat = (0.5 * (w1 + w2) if imu_avg else w1) - bg
        a_hat = (0.5 * (a1 + a2) if imu_avg else a1) - ba
        R_rel, Aarg, Barg = _rot_and_args(w_hat, dt)
        R_new = R_rel @ R
        alpha_new = alpha + beta * dt + R_new.T @ (Aarg @ a_hat)
        beta_new = beta + R_new.T @ (Barg @ a_hat)
        return (
            jnp.where(has, R_new, R),
            jnp.where(has, alpha_new, alpha),
            jnp.where(has, beta_new, beta),
        ), None

    eye = jnp.eye(3, dtype=dtype)
    init = (eye, jnp.zeros(3, dtype), jnp.zeros(3, dtype))
    inps = (imu_t[:-1], imu_w[:-1], imu_a[:-1], imu_t[1:], imu_w[1:], imu_a[1:])
    (R, alpha, beta), _ = jax.lax.scan(body, init, inps)
    dt_total = imu_t[-1] - imu_t[0]
    return {"R_k2tau": R, "alpha": alpha, "beta": beta, "dt": dt_total.astype(dtype)}


def preintegrate_v2(
    imu_t, imu_w, imu_a, bg, ba, R_GtoIk_lin, gravity, imu_avg=True
):
    """CpiV2 closed-form preintegration (`CpiV2.cpp:30-130`): the
    piecewise-constant quantity is the LOCAL gravity-compensated
    acceleration a_m - ba - R_k2tau R_GtoIk_lin g, so gravity is inside
    the integral and the shooting equations have no explicit g terms:

        p_tau = p_k + v_k dt + R_GtoIk^T alpha
        v_tau = v_k + R_GtoIk^T beta

    `R_GtoIk_lin` (3,3) is the linearization orientation at the window
    start, `gravity` (3,) the global gravity vector.
    """
    dtype = imu_w.dtype
    g_k = (R_GtoIk_lin @ gravity).astype(dtype)

    def body(carry, inp):
        R, alpha, beta = carry
        t1, w1, a1, t2, w2, a2 = inp
        dt = (t2 - t1).astype(dtype)
        has = dt > 0
        w_hat = (0.5 * (w1 + w2) if imu_avg else w1) - bg
        R_rel, Aarg, Barg = _rot_and_args(w_hat, dt)
        R_new = R_rel @ R
        a_hat = a1 - ba - R @ g_k
        if imu_avg:
            # reference averages the LOCAL acceleration after the
            # relative rotation is known (`CpiV2.cpp:92-96`)
            a_hat = 0.5 * (a_hat + a2 - ba - R_new @ g_k)
        alpha_new = alpha + beta * dt + R_new.T @ (Aarg @ a_hat)
        beta_new = beta + R_new.T @ (Barg @ a_hat)
        return (
            jnp.where(has, R_new, R),
            jnp.where(has, alpha_new, alpha),
            jnp.where(has, beta_new, beta),
        ), None

    eye = jnp.eye(3, dtype=dtype)
    init = (eye, jnp.zeros(3, dtype), jnp.zeros(3, dtype))
    inps = (imu_t[:-1], imu_w[:-1], imu_a[:-1], imu_t[1:], imu_w[1:], imu_a[1:])
    (R, alpha, beta), _ = jax.lax.scan(body, init, inps)
    dt_total = imu_t[-1] - imu_t[0]
    return {"R_k2tau": R, "alpha": alpha, "beta": beta, "dt": dt_total.astype(dtype)}
