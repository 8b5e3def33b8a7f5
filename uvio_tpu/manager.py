"""VIO manager: host orchestration around the jitted device pipeline.

Equivalent of `ov_msckf/src/core/VioManager.{h,cpp}` — builds the
layout/state, buffers IMU, ingests feature tracks (sim tracker or a
real frontend), and runs the per-frame pipeline of
`do_feature_propagate_update` (`VioManager.cpp:323-714`):

    propagate+clone -> feature triage -> MSCKF update
    -> [SLAM update/init, round 2] -> marginalize oldest clone

Device work (propagation scan, batched MSCKF update) is jitted once per
static layout; host work is O(features) dict bookkeeping per frame.

The clone window uses `max_clones + 1` ring slots: the reference lets
the window grow to N+1 between `augment_clone` and end-of-update
marginalization (`VioManager.cpp:584-597`); the extra slot gives the
same semantics with static shapes.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .cam import RADTAN
from .filter.ekf import marginalize_clone
from .filter.propagator import (
    NoiseManager,
    propagate_and_clone,
    select_imu_readings_np,
)
from .frontend.database import FeatureDatabase
from .types.layout import StateLayout
from .types.state import FilterState, init_state, num_clones, oldest_clone_slot
from .update.msckf import msckf_update


@dataclasses.dataclass
class CameraConfig:
    model: int = RADTAN
    intrinsics: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([458.0, 458.0, 367.0, 248.0, 0, 0, 0, 0.0])
    )
    q_ItoC: np.ndarray = dataclasses.field(default_factory=lambda: np.array([0.0, 0, 0, 1]))
    p_IinC: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))


@dataclasses.dataclass
class VioConfig:
    max_clones: int = 11
    max_slam: int = 0
    max_msckf_in_update: int = 40
    max_imu_batch: int = 64
    gravity_mag: float = 9.81
    sigma_pix: float = 1.0
    chi2_mult: float = 1.0
    noises: NoiseManager = dataclasses.field(default_factory=NoiseManager)
    cameras: List[CameraConfig] = dataclasses.field(default_factory=lambda: [CameraConfig()])
    calib_cam_pose: bool = False
    calib_cam_intrinsics: bool = False
    calib_cam_timeoffset: bool = False


class VioManager:
    def __init__(self, cfg: VioConfig):
        self.cfg = cfg
        self.layout = StateLayout(
            max_clones=cfg.max_clones + 1,
            max_slam=cfg.max_slam,
            num_cams=len(cfg.cameras),
            calib_cam_timeoffset=cfg.calib_cam_timeoffset,
            calib_cam_pose=cfg.calib_cam_pose,
            calib_cam_intrinsics=cfg.calib_cam_intrinsics,
            max_imu_batch=cfg.max_imu_batch,
        )
        s = init_state(self.layout)
        # seed calibration values from config
        s = s.replace(
            calib_cam_q=jnp.asarray(np.stack([c.q_ItoC for c in cfg.cameras])),
            calib_cam_p=jnp.asarray(np.stack([c.p_IinC for c in cfg.cameras])),
            calib_cam_intr=jnp.asarray(np.stack([c.intrinsics for c in cfg.cameras])),
        )
        self.state: FilterState = s
        self.db = FeatureDatabase()
        self.is_initialized = False
        # imu buffer (host)
        self._imu_t: List[float] = []
        self._imu_w: List[np.ndarray] = []
        self._imu_a: List[np.ndarray] = []
        # host mirror: clone slot -> timestamp
        self.slot_times: Dict[int, float] = {}
        self._head = -1

        self._jit_prop = jax.jit(
            partial(propagate_and_clone, layout=self.layout, noises=cfg.noises,
                    gravity_mag=cfg.gravity_mag)
        )
        cam_model = cfg.cameras[0].model
        self._jit_msckf = jax.jit(
            partial(
                msckf_update,
                layout=self.layout,
                cam_model=cam_model,
                sigma_pix=cfg.sigma_pix,
                chi2_mult=cfg.chi2_mult,
            )
        )
        self._jit_marg = jax.jit(partial(marginalize_clone, layout=self.layout))

    # ------------------------------------------------------------------
    def initialize_with_gt(self, t, q_GtoI, p, v, bg, ba, prior_std=None):
        """Groundtruth initialization (`VioManagerHelper.cpp:40-76`)."""
        if prior_std is None:
            # reference seeds small diagonal priors
            prior_std = np.concatenate(
                [
                    np.full(3, 0.02),  # theta (rad)
                    np.full(3, 0.05),  # p
                    np.full(3, 0.05),  # v
                    np.full(3, 0.002),  # bg
                    np.full(3, 0.02),  # ba
                ]
            )
        D = self.layout.dim
        cov = np.zeros((D, D))
        cov[:15, :15] = np.diag(prior_std**2)
        q = jnp.asarray(q_GtoI)
        self.state = self.state.replace(
            time=jnp.asarray(float(t)),
            q=q, q_fej=q,
            p=jnp.asarray(p), p_fej=jnp.asarray(p),
            v=jnp.asarray(v), v_fej=jnp.asarray(v),
            bg=jnp.asarray(bg), ba=jnp.asarray(ba),
            cov=jnp.asarray(cov),
        )
        self.is_initialized = True

    # ------------------------------------------------------------------
    def feed_imu(self, t: float, w: np.ndarray, a: np.ndarray):
        self._imu_t.append(float(t))
        self._imu_w.append(np.asarray(w))
        self._imu_a.append(np.asarray(a))

    # ------------------------------------------------------------------
    def feed_features(self, t: float, cam_obs: List[Tuple[np.ndarray, np.ndarray]]):
        """Ingest one frame of tracked features and run the pipeline.

        cam_obs: per camera, (ids (N,), uvs (N,2)) — the TrackSIM path
        (`feed_measurement_simulation`); a real frontend feeds the same.
        """
        for cam, (ids, uvs) in enumerate(cam_obs):
            for i, fid in enumerate(ids):
                self.db.update_feature(int(fid), t, cam, float(uvs[i, 0]), float(uvs[i, 1]))
        if not self.is_initialized:
            return
        if t <= float(self.state.time):
            return  # out-of-order frame: drop (reference warns+drops)
        self._propagate_clone(t)
        self._msckf_step(t)
        self._marginalize(t)

    # ------------------------------------------------------------------
    def _propagate_clone(self, t: float):
        t0 = float(self.state.time)
        tt, ww, aa = select_imu_readings_np(
            np.asarray(self._imu_t), np.stack(self._imu_w), np.stack(self._imu_a),
            t0, t, self.layout.max_imu_batch,
        )
        self.state = self._jit_prop(
            self.state, imu_t=jnp.asarray(tt), imu_w=jnp.asarray(ww), imu_a=jnp.asarray(aa)
        )
        # mirror ring arithmetic
        K = self.layout.max_clones
        self._head = 0 if self._head < 0 else (self._head + 1) % K
        self.slot_times[self._head] = t
        # trim consumed imu (keep a tail for interpolation)
        while len(self._imu_t) > 2 and self._imu_t[1] < t - 0.2:
            self._imu_t.pop(0)
            self._imu_w.pop(0)
            self._imu_a.pop(0)

    # ------------------------------------------------------------------
    def _select_msckf_feats(self, t: float):
        """Triage (`VioManager.cpp:366-500`, SLAM promotion in round 2):
        lost features + features observed at the to-be-marginalized
        clone time, longest tracks first, capped."""
        lost = [f for f in self.db.features_not_seen_at(t) if f.num_obs() >= 2]
        marg = []
        if len(self.slot_times) > self.cfg.max_clones:
            marg_t = min(self.slot_times.values())
            marg = [f for f in self.db.features_seen_at(marg_t) if f.newest_time() >= t]
        feats = {f.feat_id: f for f in lost + marg}.values()
        feats = sorted(feats, key=lambda f: -f.num_obs())
        return list(feats)[: self.cfg.max_msckf_in_update]

    def _build_obs(self, feats):
        """Pad tracks into (F,K,C,2)+(F,K,C) aligned to clone slots."""
        L = self.layout
        F = self.cfg.max_msckf_in_update
        K, C = L.max_clones, L.num_cams
        uv = np.zeros((F, K, C, 2))
        mask = np.zeros((F, K, C), bool)
        time_to_slot = {tt: s for s, tt in self.slot_times.items()}
        for i, f in enumerate(feats):
            for cam, lst in f.obs.items():
                for (tt, u, v) in lst:
                    s = time_to_slot.get(tt)
                    if s is not None:
                        uv[i, s, cam] = (u, v)
                        mask[i, s, cam] = True
        return jnp.asarray(uv), jnp.asarray(mask)

    def _msckf_step(self, t: float):
        feats = self._select_msckf_feats(t)
        if not feats:
            return
        uv, mask = self._build_obs(feats)
        self.state, info = self._jit_msckf(self.state, obs_uv=uv, obs_mask=mask)
        self.last_msckf_info = info
        # consume used features (reference sets to_delete on MSCKF feats)
        for f in feats:
            f.to_delete = True
        self.db.cleanup()

    # ------------------------------------------------------------------
    def _marginalize(self, t: float):
        if len(self.slot_times) > self.cfg.max_clones:
            slot = min(self.slot_times, key=self.slot_times.get)
            marg_t = self.slot_times.pop(slot)
            self.state = self._jit_marg(self.state, slot=jnp.int32(slot))
            # drop observations at (and before) the marginalized time —
            # their clone no longer exists
            self.db.cleanup_older_than(marg_t + 1e-9)

    # ------------------------------------------------------------------
    def get_pose(self):
        """Current (q_GtoI, p_IinG) estimate as numpy."""
        return np.asarray(self.state.q), np.asarray(self.state.p)
