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
