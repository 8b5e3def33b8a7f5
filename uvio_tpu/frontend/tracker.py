"""KLT tracker orchestration (TrackKLT equivalent).

Persistent feature slots with host-side id management; per-frame device
work (pyramid, FAST grid detection with occupancy, pyramidal LK,
fundamental RANSAC) is one jitted call. Emits (ids, uvs) per frame in
the same shape the manager's `feed_features` consumes — a drop-in
replacement for the sim tracker on real or rendered images.

Mirrors `TrackKLT::feed_monocular` (`ov_core/src/track/TrackKLT.cpp:
96-200`): track forward, reject with RANSAC, re-detect into free grid
cells, all with static shapes and masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cam import models as cam_models
from .klt import build_pyramid, fast_score, grid_detect, lk_track, ransac_fundamental


class KLTTracker:
    def __init__(
        self,
        intrinsics: np.ndarray,
        cam_model: int = 0,
        num_features: int = 150,
        grid: tuple = (8, 10),
        levels: int = 4,
        fast_thresh: float = 20.0,
        window_half: int = 7,
        cam_id: int = 0,
        histeq: str = "HISTOGRAM",
    ):
        self.intrinsics = jnp.asarray(intrinsics, jnp.float32)
        self.cam_model = cam_model
        self.cap = num_features
        self.grid = grid
        self.levels = levels
        self.fast_thresh = fast_thresh
        self.half = window_half
        self.cam_id = cam_id
        # image preprocessing (`TrackKLT.cpp:56-67`): the reference
        # equalizes unconditionally; HISTOGRAM runs as jitted device
        # work, CLAHE falls back to the cv2 host path
        self.histeq = histeq

        # detection capacity per cell sized like the reference
        # (`Grider_FAST.h:73` num_features/grid, here capped to bound
        # the top_k compile size): after mass track loss the detector
        # can refill the whole budget in one frame instead of one
        # corner per cell per frame
        import math

        self.per_cell = max(1, min(4, math.ceil(num_features / (grid[0] * grid[1]))))

        self.uv = np.zeros((self.cap, 2), np.float32)
        self.active = np.zeros(self.cap, bool)
        self.ids = np.full(self.cap, -1, np.int64)
        self.next_id = 0
        self.prev_img = None
        self._key = jax.random.PRNGKey(0)
        fx = float(intrinsics[0])
        fy = float(intrinsics[1])
        self.ransac_thresh = 2.0 / max(fx, fy)  # TrackKLT.cpp:873 convention
        self._jit_step = None  # built at first frame (levels depend on size)

    def _build_step(self, img_shape):
        # coarsest pyramid level must still contain the LK window
        min_dim = min(img_shape)
        levels = self.levels
        while levels > 1 and min_dim // (2 ** (levels - 1)) < 2 * (self.half + 2):
            levels -= 1
        self.levels = levels
        self._jit_step = jax.jit(
            partial(
                self._device_step,
                levels=self.levels,
                grid=self.grid,
                cam_model=self.cam_model,
                half=self.half,
                fast_thresh=self.fast_thresh,
                histeq=self.histeq if self.histeq != "CLAHE" else "NONE",
                per_cell=self.per_cell,
            )
        )

    # -- device side ----------------------------------------------------
    @staticmethod
    def _device_step(
        img_prev,
        img,
        uv,
        active,
        intr,
        key,
        ransac_thresh,
        *,
        levels,
        grid,
        cam_model,
        half,
        fast_thresh,
        histeq,
        per_cell,
    ):
        if histeq == "HISTOGRAM":
            from .klt import hist_equalize

            img_prev = hist_equalize(img_prev)
            img = hist_equalize(img)
        pyr_prev = build_pyramid(img_prev, levels)
        pyr = build_pyramid(img, levels)
        uv_new, ok = lk_track(pyr_prev, pyr, uv, active, half=half)
        # RANSAC in normalized coordinates
        uvn1 = cam_models.undistort(intr, cam_model, uv)
        uvn2 = cam_models.undistort(intr, cam_model, uv_new)
        inl = ransac_fundamental(uvn1, uvn2, ok & active, key, ransac_thresh)
        tracked = active & ok & inl
        # keep failed tracks' slots free; detect new corners in free cells
        score = fast_score(img, fast_thresh)
        det_uv, det_ok = grid_detect(
            score, grid[0], grid[1], uv_new, tracked, per_cell=per_cell
        )
        return uv_new, tracked, det_uv, det_ok

    # -- host side ------------------------------------------------------
    def feed(self, t: float, img: np.ndarray):
        """Process one image; returns (ids (N,), uvs (N,2)) of active
        tracks (including newly spawned ones)."""
        if self.histeq == "CLAHE":
            from .aruco import histogram_equalize

            img = histogram_equalize(np.asarray(img), "CLAHE")
        img_j = jnp.asarray(img, jnp.float32)
        if self._jit_step is None:
            self._build_step(img.shape)
        if self.prev_img is None:
            self.prev_img = img_j
            # initial detection only (same preprocessing as the step)
            from .klt import hist_equalize

            det_img = hist_equalize(img_j) if self.histeq == "HISTOGRAM" else img_j
            score = fast_score(det_img, self.fast_thresh)
            det_uv, det_ok = grid_detect(
                score, self.grid[0], self.grid[1],
                jnp.asarray(self.uv), jnp.asarray(self.active),
                per_cell=self.per_cell,
            )
            self._spawn(np.asarray(det_uv), np.asarray(det_ok))
            return self._emit()

        self._key, sub = jax.random.split(self._key)
        uv_new, tracked, det_uv, det_ok = self._jit_step(
            self.prev_img, img_j, jnp.asarray(self.uv), jnp.asarray(self.active),
            self.intrinsics, sub, self.ransac_thresh,
        )
        self.uv = np.array(uv_new)  # writable copies
        self.active = np.array(tracked)
        self.ids[~self.active] = -1
        self._spawn(np.asarray(det_uv), np.asarray(det_ok))
        self.prev_img = img_j
        return self._emit()

    def stereo_match(self, img_left, img_right, uv_left, valid):
        """LK-match features from the left image into the right image
        (TrackKLT::perform_matching stereo path, `TrackKLT.cpp:202-390`):
        left positions seed the right-image search; failures masked.
        Returns (uv_right (N,2), ok (N,))."""
        import jax.numpy as jnp

        from .klt import build_pyramid, lk_track

        from .klt import hist_equalize

        il = jnp.asarray(img_left, jnp.float32)
        ir = jnp.asarray(img_right, jnp.float32)
        if self.histeq == "HISTOGRAM":
            il, ir = hist_equalize(il), hist_equalize(ir)
        elif self.histeq == "CLAHE":
            from .aruco import histogram_equalize

            il = jnp.asarray(histogram_equalize(np.asarray(img_left), "CLAHE"), jnp.float32)
            ir = jnp.asarray(histogram_equalize(np.asarray(img_right), "CLAHE"), jnp.float32)
        pl = build_pyramid(il, self.levels)
        pr = build_pyramid(ir, self.levels)
        uv_r, ok = lk_track(pl, pr, jnp.asarray(uv_left), jnp.asarray(valid), half=self.half)
        return np.array(uv_r), np.array(ok)

    def _spawn(self, det_uv, det_ok):
        free = np.nonzero(~self.active)[0]
        new = np.nonzero(det_ok)[0]
        n = min(len(free), len(new))
        for i in range(n):
            slot = free[i]
            self.uv[slot] = det_uv[new[i]]
            self.active[slot] = True
            self.ids[slot] = self.next_id
            self.next_id += 1

    def _emit(self):
        sel = self.active
        return self.ids[sel].copy(), self.uv[sel].copy()
