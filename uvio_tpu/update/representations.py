"""Landmark representations.

Equivalent of `ov_core/src/types/LandmarkRepresentation.h` +
`UpdaterHelper::get_feature_jacobian_representation`
(`UpdaterHelper.cpp:32-190`). All six reference representations
(`LandmarkRepresentation.h:39-45`):

  * GLOBAL_3D                      — value is p_FinG directly;
  * ANCHORED_MSCKF_INVERSE_DEPTH   — (alpha, beta, rho) in the anchor
    *camera* frame (anchor = a clone slot + cam id); the measurement
    Jacobian wrt the anchor pose is deliberately dropped (the "MSCKF"
    flavor, cf. UpdaterHelper.cpp:116-130);
  * ANCHORED_3D                    — p_FinA in the anchor camera frame;
  * GLOBAL_FULL_INVERSE_DEPTH      — spherical (theta, phi, rho) global;
  * ANCHORED_FULL_INVERSE_DEPTH    — spherical in the anchor frame;
  * ANCHORED_INVERSE_DEPTH_SINGLE  — 1-dof depth along a frozen bearing.

Also provides the anchor-change transform (`UpdaterSLAM::
change_anchors/perform_anchor_change`, UpdaterSLAM.cpp:481-560+):
re-anchoring a landmark to a new clone is a linearized
re-parameterization — value recomputed exactly, covariance rows mapped
through Phi = [A at old-landmark cols, B at old-anchor cols, C at
new-anchor cols].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..math import quat_to_rot, skew
from ..types.layout import StateLayout
from ..types.state import FilterState

GLOBAL_3D = 0
ANCHORED_MSCKF_INVERSE_DEPTH = 1
ANCHORED_3D = 2
GLOBAL_FULL_INVERSE_DEPTH = 3
# spherical (theta, phi, rho) in the anchor camera frame
ANCHORED_FULL_INVERSE_DEPTH = 4
# 1-dof depth-only: (alpha, beta) bearing frozen at first estimate,
# only rho carries error-state dofs (`LandmarkRepresentation.h:45`,
# Landmark size 1). Stored padded to 3 values; the alpha/beta rows of
# the landmark covariance are zeroed at init and their Jacobian
# columns/rows are zero thereafter — algebraically identical to a
# 1-dof state block.
ANCHORED_INVERSE_DEPTH_SINGLE = 5


def _anchor_cam_pose(state, slot, cam, fej: bool):
    """(R_GtoC, p_CinG, R_GtoI, p_IinG) of clone `slot` seen by `cam`."""
    q = state.clones_q_fej[slot] if fej else state.clones_q[slot]
    p_I = state.clones_p_fej[slot] if fej else state.clones_p[slot]
    R_GtoI = quat_to_rot(q)
    R_ItoC = quat_to_rot(state.calib_cam_q[cam])
    p_IinC = state.calib_cam_p[cam]
    R_GtoC = R_ItoC @ R_GtoI
    p_CinI = -R_ItoC.T @ p_IinC
    p_CinG = p_I + R_GtoI.T @ p_CinI
    return R_GtoC, p_CinG, R_GtoI, p_I


def invdepth_to_point(val):
    """(alpha, beta, rho) -> p_FinA (anchor camera frame)."""
    a, b, rho = val[0], val[1], val[2]
    safe = jnp.where(jnp.abs(rho) < 1e-8, 1e-8, rho)
    return jnp.stack([a / safe, b / safe, 1.0 / safe])


def point_to_invdepth(p_FinA):
    z = jnp.where(jnp.abs(p_FinA[2]) < 1e-8, 1e-8, p_FinA[2])
    return jnp.stack([p_FinA[0] / z, p_FinA[1] / z, 1.0 / z])


def d_point_d_invdepth(val):
    """d p_FinA / d (alpha, beta, rho) (3,3)."""
    a, b, rho = val[0], val[1], val[2]
    safe = jnp.where(jnp.abs(rho) < 1e-8, 1e-8, rho)
    ir = 1.0 / safe
    ir2 = ir * ir
    return jnp.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 0]], val.dtype
    ) * ir - jnp.outer(jnp.stack([a * ir2, b * ir2, ir2]), jnp.array([0.0, 0, 1], val.dtype))


def d_invdepth_d_point(p_FinA):
    """d (alpha,beta,rho) / d p_FinA (3,3)."""
    x, y, z = p_FinA[0], p_FinA[1], p_FinA[2]
    zz = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
    return jnp.array(
        [
            [1.0 / zz, 0.0, -x / zz**2],
            [0.0, 1.0 / zz, -y / zz**2],
            [0.0, 0.0, -1.0 / zz**2],
        ],
        p_FinA.dtype,
    )


def sphere_to_point(val):
    """(theta, phi, rho) spherical inverse depth -> p_FinG
    (GLOBAL_FULL_INVERSE_DEPTH, Landmark.cpp convention)."""
    th, ph, rho = val[0], val[1], val[2]
    safe = jnp.where(jnp.abs(rho) < 1e-8, 1e-8, rho)
    return (
        jnp.stack([jnp.cos(th) * jnp.sin(ph), jnp.sin(th) * jnp.sin(ph), jnp.cos(ph)])
        / safe
    )


def point_to_sphere(p):
    rho = 1.0 / jnp.maximum(jnp.linalg.norm(p), 1e-8)
    ph = jnp.arccos(jnp.clip(rho * p[2], -1.0, 1.0))
    th = jnp.arctan2(p[1], p[0])
    return jnp.stack([th, ph, rho])


def d_point_d_sphere(val):
    """d p_FinG / d (theta, phi, rho) — UpdaterHelper.cpp:62-71."""
    th, ph, rho = val[0], val[1], val[2]
    s, c = jnp.sin, jnp.cos
    safe = jnp.where(jnp.abs(rho) < 1e-8, 1e-8, rho)
    return jnp.stack(
        [
            jnp.stack([-s(th) * s(ph) / safe, c(th) * c(ph) / safe, -c(th) * s(ph) / safe**2]),
            jnp.stack([c(th) * s(ph) / safe, s(th) * c(ph) / safe, -s(th) * s(ph) / safe**2]),
            jnp.stack([jnp.zeros_like(th), -s(ph) / safe, -c(ph) / safe**2]),
        ]
    )


def is_anchored(rep: int) -> bool:
    return rep in (
        ANCHORED_MSCKF_INVERSE_DEPTH,
        ANCHORED_3D,
        ANCHORED_FULL_INVERSE_DEPTH,
        ANCHORED_INVERSE_DEPTH_SINGLE,
    )


def value_from_anchor_point(rep: int, p_FinA):
    """Anchor-frame point -> representation value."""
    if rep == ANCHORED_3D:
        return p_FinA
    if rep == ANCHORED_FULL_INVERSE_DEPTH:
        return point_to_sphere(p_FinA)
    return point_to_invdepth(p_FinA)


def anchor_point_from_value(rep: int, val):
    if rep == ANCHORED_3D:
        return val
    if rep == ANCHORED_FULL_INVERSE_DEPTH:
        return sphere_to_point(val)
    return invdepth_to_point(val)


def d_anchor_point_d_value(rep: int, val):
    if rep == ANCHORED_3D:
        return jnp.eye(3, dtype=val.dtype)
    if rep == ANCHORED_FULL_INVERSE_DEPTH:
        return d_point_d_sphere(val)
    J = d_point_d_invdepth(val)
    if rep == ANCHORED_INVERSE_DEPTH_SINGLE:
        # bearing frozen: only the rho column carries error
        J = J * jnp.array([0.0, 0.0, 1.0], val.dtype)[None, :]
    return J


def d_value_d_anchor_point(rep: int, p_FinA):
    if rep == ANCHORED_3D:
        return jnp.eye(3, dtype=p_FinA.dtype)
    if rep == ANCHORED_FULL_INVERSE_DEPTH:
        return jax.jacfwd(point_to_sphere)(p_FinA)
    J = d_invdepth_d_point(p_FinA)
    if rep == ANCHORED_INVERSE_DEPTH_SINGLE:
        # only the rho row maps error back into the value
        J = J * jnp.array([0.0, 0.0, 1.0], p_FinA.dtype)[:, None]
    return J


def landmark_global(state: FilterState, layout: StateLayout, fej: bool = False):
    """(S,3) global positions of all landmark slots, plus (S,3,3) chain
    Jacobian d p_FinG / d value (identity for GLOBAL_3D)."""
    rep = layout.slam_rep
    if rep == GLOBAL_3D:
        vals = state.slam_p_fej if fej else state.slam_p
        eye = jnp.broadcast_to(jnp.eye(3, dtype=vals.dtype), (layout.max_slam, 3, 3))
        return vals, eye
    if rep == GLOBAL_FULL_INVERSE_DEPTH:
        vals = state.slam_p_fej if fej else state.slam_p
        return jax.vmap(sphere_to_point)(vals), jax.vmap(d_point_d_sphere)(vals)

    def one(slot_idx):
        val = (state.slam_p_fej if fej else state.slam_p)[slot_idx]
        a_slot = state.slam_anchor_slot[slot_idx]
        a_cam = state.slam_anchor_cam[slot_idx]
        R_GtoC, p_CinG, _, _ = _anchor_cam_pose(state, a_slot, a_cam, fej)
        p_FinA = anchor_point_from_value(rep, val)
        p_FinG = R_GtoC.T @ p_FinA + p_CinG
        J = R_GtoC.T @ d_anchor_point_d_value(rep, val)
        return p_FinG, J

    return jax.vmap(one)(jnp.arange(layout.max_slam))


def anchored_chain(state: FilterState, layout: StateLayout):
    """Per-slot linearization pieces for anchored landmarks, with FEJ
    handled like the reference (`UpdaterHelper.cpp:88-99`): the current
    best global position is re-expressed in the FEJ anchor frame.

    Returns (p_glob (S,3), p_glob_fej (S,3), J_rep (S,3,3) =
    d p_FinG/d value, H_anc (S,3,6) = d p_FinG/d(anchor theta, p)).

    p_glob_fej is the FEJ linearization point for the *clone* Jacobians
    (`get_feature_jacobian_full`): the frozen landmark FEJ value for the
    global representations, and the current best for anchored ones
    ("we can use the best p_FinG since the value of p_FinA does not
    matter", UpdaterHelper.cpp:286-289).
    """
    S = layout.max_slam
    rep = layout.slam_rep
    if rep == GLOBAL_3D:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=state.slam_p.dtype), (S, 3, 3))
        return (
            state.slam_p,
            state.slam_p_fej,
            eye,
            jnp.zeros((S, 3, 6), state.slam_p.dtype),
        )
    if rep == GLOBAL_FULL_INVERSE_DEPTH:
        # FEJ on the stored value (UpdaterHelper.cpp:45-46)
        p_glob = jax.vmap(sphere_to_point)(state.slam_p)
        p_glob_fej = jax.vmap(sphere_to_point)(state.slam_p_fej)
        J = jax.vmap(d_point_d_sphere)(state.slam_p_fej)
        return p_glob, p_glob_fej, J, jnp.zeros((S, 3, 6), state.slam_p.dtype)

    def one(s):
        val = state.slam_p[s]
        a_slot = state.slam_anchor_slot[s]
        cam = state.slam_anchor_cam[s]
        R_GtoC, p_CinG, _, _ = _anchor_cam_pose(state, a_slot, cam, False)
        p_FinA = anchor_point_from_value(rep, val)
        p_FinG = R_GtoC.T @ p_FinA + p_CinG  # current best
        # transform best into the FEJ anchor frame
        R_GtoI_f = quat_to_rot(state.clones_q_fej[a_slot])
        p_I_f = state.clones_p_fej[a_slot]
        R_ItoC = quat_to_rot(state.calib_cam_q[cam])
        p_IinC = state.calib_cam_p[cam]
        p_FinA_fej = R_ItoC @ R_GtoI_f @ (p_FinG - p_I_f) + p_IinC
        R_CtoG = R_GtoI_f.T @ R_ItoC.T
        J_rep = R_CtoG @ d_anchor_point_d_value(
            rep, value_from_anchor_point(rep, p_FinA_fej)
        )
        H_anc_th = -R_GtoI_f.T @ skew(R_ItoC.T @ (p_FinA_fej - p_IinC))
        H_anc = jnp.concatenate(
            [H_anc_th, jnp.eye(3, dtype=val.dtype)], axis=1
        )
        return p_FinG, J_rep, H_anc

    p_glob, J_rep, H_anc = jax.vmap(one)(jnp.arange(S))
    return p_glob, p_glob, J_rep, H_anc


def point_to_rep(state: FilterState, layout: StateLayout, p_FinG, anchor_slot, anchor_cam):
    """Global point -> representation value for a (new) anchor."""
    rep = layout.slam_rep
    if rep == GLOBAL_3D:
        return p_FinG
    if rep == GLOBAL_FULL_INVERSE_DEPTH:
        return point_to_sphere(p_FinG)
    R_GtoC, p_CinG, _, _ = _anchor_cam_pose(state, anchor_slot, anchor_cam, False)
    return value_from_anchor_point(rep, R_GtoC @ (p_FinG - p_CinG))


def anchor_change(state: FilterState, layout: StateLayout, marg_slot, new_slot):
    """Re-anchor every landmark currently anchored at clone `marg_slot`
    to clone `new_slot` (value exactly, covariance to first order)."""
    if not is_anchored(layout.slam_rep):
        return state
    L = layout
    D = L.dim

    def do_one(st, s):
        needs = st.slam_valid[s] & (st.slam_anchor_slot[s] == marg_slot)

        def change(st):
            val = st.slam_p[s]
            cam = st.slam_anchor_cam[s]
            rep = L.slam_rep
            R_ItoC = quat_to_rot(st.calib_cam_q[cam])
            p_IinC = st.calib_cam_p[cam]
            # current estimates: exact value transform
            R_a, p_a, _, _ = _anchor_cam_pose(st, marg_slot, cam, False)
            R_n, p_n, _, _ = _anchor_cam_pose(st, new_slot, cam, False)
            p_FinA = anchor_point_from_value(rep, val)
            p_FinG = R_a.T @ p_FinA + p_a
            p_FinCn = R_n @ (p_FinG - p_n)
            new_val = value_from_anchor_point(rep, p_FinCn)

            # FEJ anchor poses for the covariance-transform Jacobians:
            # the reference builds Phi via
            # `get_feature_jacobian_representation`, whose FEJ branch
            # re-expresses the current best p_FinG in each anchor's FEJ
            # frame (UpdaterSLAM.cpp:525-610, UpdaterHelper.cpp:88-99).
            R_af, p_af, R_Iaf, _ = _anchor_cam_pose(st, marg_slot, cam, True)
            R_nf, p_nf, R_Inf, _ = _anchor_cam_pose(st, new_slot, cam, True)
            pA_lin_old = R_af @ (p_FinG - p_af)  # old FEJ anchor frame
            pA_lin_new = R_nf @ (p_FinG - p_nf)  # new FEJ anchor frame

            # Hf_old = R_af^T @ d(pA)/d(val) at the FEJ-re-expressed value
            Jd_old = d_anchor_point_d_value(
                rep, value_from_anchor_point(rep, pA_lin_old)
            )
            Jinv_new = d_value_d_anchor_point(rep, pA_lin_new)  # (Hf_new R)^-1 leg

            # A: wrt old landmark value = Hf_new^{-1} Hf_old
            A = Jinv_new @ R_nf @ (R_af.T @ Jd_old)
            # B: wrt old anchor clone = Hf_new^{-1} H_anc_old
            B_th = Jinv_new @ R_nf @ (
                -R_Iaf.T @ skew(R_ItoC.T @ (pA_lin_old - p_IinC))
            )
            B_p = Jinv_new @ R_nf
            # C: wrt new anchor clone = -Hf_new^{-1} H_anc_new
            C_th = Jinv_new @ R_ItoC @ skew(R_ItoC.T @ (pA_lin_new - p_IinC))
            C_p = -Jinv_new @ R_nf

            Phi = jnp.zeros((3, D), st.cov.dtype)
            f_off = jnp.int32(L.slam_slot_off(s))
            o_off = jnp.int32(L.clone_off + 6 * marg_slot)
            n_off = jnp.int32(L.clone_off + 6 * new_slot)
            Phi = jax.lax.dynamic_update_slice(Phi, A, (jnp.int32(0), f_off))
            Phi = jax.lax.dynamic_update_slice(Phi, B_th, (jnp.int32(0), o_off))
            Phi = jax.lax.dynamic_update_slice(Phi, B_p, (jnp.int32(0), o_off + 3))
            Phi = jax.lax.dynamic_update_slice(Phi, C_th, (jnp.int32(0), n_off))
            Phi = jax.lax.dynamic_update_slice(Phi, C_p, (jnp.int32(0), n_off + 3))

            rows = Phi @ st.cov  # (3,D)
            block = rows @ Phi.T
            cov = jax.lax.dynamic_update_slice(st.cov, rows, (f_off, jnp.int32(0)))
            cov = jax.lax.dynamic_update_slice(cov, rows.T, (jnp.int32(0), f_off))
            cov = jax.lax.dynamic_update_slice(cov, block, (f_off, f_off))
            # FEJ value transforms with the FEJ anchor poses
            # (UpdaterSLAM.cpp:560-576: R_OLDtoNEW_fej / p_OLDinNEW_fej)
            p_FinG_fej = R_af.T @ anchor_point_from_value(
                rep, st.slam_p_fej[s]
            ) + p_af
            new_fej = value_from_anchor_point(rep, R_nf @ (p_FinG_fej - p_nf))
            return st.replace(
                cov=cov,
                slam_p=st.slam_p.at[s].set(new_val),
                slam_p_fej=st.slam_p_fej.at[s].set(new_fej),
                slam_anchor_slot=st.slam_anchor_slot.at[s].set(
                    jnp.int32(new_slot)
                ),
            )

        return jax.lax.cond(needs, change, lambda x: x, st), None

    state, _ = jax.lax.scan(do_one, state, jnp.arange(L.max_slam))
    return state
