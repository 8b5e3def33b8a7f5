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
        self.intrinsics_right = intrinsics_right

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
        ids_r = sel_ids[ok]
        uvs_r = uv_r[ok]
        return [(ids, uvs), (ids_r, uvs_r)]
