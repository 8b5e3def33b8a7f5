"""Stereo KLT tracking.

Equivalent of the reference's `TrackKLT::feed_stereo`
(`TrackKLT.cpp:202-390`): temporal KLT in the left camera, then
left-to-right LK matching per frame with the SAME feature ids, so both
cameras' observations land in the database under one feature — which is
what gives the estimator its instantaneous stereo baseline constraint.
"""

from __future__ import annotations

import numpy as np

from .tracker import KLTTracker


class StereoKLTTracker:
    """Tracks temporally in cam0 and matches into cam1 each frame.

    `feed(t, img_left, img_right)` returns the per-camera observation
    list the manager consumes: [(ids, uvs_left), (ids_r, uvs_right)].
    """

    def __init__(self, intrinsics_left, intrinsics_right, cam_model=0, **kw):
        self.left = KLTTracker(intrinsics_left, cam_model, cam_id=0, **kw)
        self.intrinsics_right = np.asarray(intrinsics_right, np.float64)
        self._key = None

    def feed(self, t: float, img_left: np.ndarray, img_right: np.ndarray):
        ids, uvs = self.left.feed(t, img_left)
        if len(ids) == 0:
            return [(ids, uvs), (ids, uvs)]
        # match active left features into the right image
        sel_uv = self.left.uv[self.left.active]
        sel_ids = self.left.ids[self.left.active]
        uv_r, ok = self.left.stereo_match(
            img_left, img_right, sel_uv, np.ones(len(sel_uv), bool)
        )
        # RANSAC on the left<->right correspondences (the reference runs
        # an 8-pt RANSAC over the right-camera matches too,
        # `TrackKLT.cpp:202-390`; its check is temporal t-1 -> t in the
        # right camera — ours re-matches from the left every frame, so
        # the left<->right epipolar check is the analogous gate)
        if ok.sum() >= 12:
            import jax
            import jax.numpy as jnp

            from ..cam import models as cam_models
            from .klt import ransac_fundamental

            if self._key is None:
                self._key = jax.random.PRNGKey(1)
            self._key, sub = jax.random.split(self._key)
            uvn_l = cam_models.undistort(
                jnp.asarray(self.left.intrinsics), self.left.cam_model,
                jnp.asarray(sel_uv),
            )
            uvn_r = cam_models.undistort(
                jnp.asarray(self.intrinsics_right), self.left.cam_model,
                jnp.asarray(uv_r),
            )
            inl = ransac_fundamental(
                uvn_l, uvn_r, jnp.asarray(ok), sub, self.left.ransac_thresh
            )
            ok = ok & np.asarray(inl)
        ids_r = sel_ids[ok]
        uvs_r = uv_r[ok]
        return [(ids, uvs), (ids_r, uvs_r)]
