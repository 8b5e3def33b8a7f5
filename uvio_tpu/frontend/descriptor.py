"""Descriptor-based tracker.

Equivalent of `ov_core/src/track/TrackDescriptor.{h,cpp}` (ORB grid
extraction + Hamming knn matching with ratio test + symmetry check +
RANSAC), re-designed batched:

  * detection reuses the vectorized FAST grid detector;
  * descriptors are 256-bit BRIEF (seeded fixed point-pair pattern over
    a smoothed patch, packed into 8 uint32 words);
  * matching is one XOR + population-count Hamming matrix with ratio
    and mutual-best (symmetry) tests, then fundamental RANSAC;
  * ORB rotation invariance (`TrackDescriptor.cpp:355-478` extracts
    oriented ORB): intensity-centroid orientation over a circular patch
    (the ORB moment method) steers the BRIEF sampling pattern, so
    matching survives in-plane rotation (aggressive UAV flight).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..cam import models as cam_models
from .klt import build_pyramid, fast_score, grid_detect, ransac_fundamental

_N_BITS = 256
_PATCH_HALF = 15


def _brief_pattern(seed=7):
    rng = np.random.default_rng(seed)
    # Gaussian sampling like BRIEF; clamp inside the patch
    pts = np.clip(
        rng.normal(scale=_PATCH_HALF / 2.5, size=(_N_BITS, 2, 2)),
        -_PATCH_HALF + 1,
        _PATCH_HALF - 1,
    )
    return jnp.asarray(pts, jnp.float32)


_PATTERN = _brief_pattern()


def _disk_offsets(radius=_PATCH_HALF):
    """Integer offsets of a filled disk (static, for the ORB moments)."""
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    m = ys**2 + xs**2 <= radius**2
    return jnp.asarray(np.stack([xs[m], ys[m]], axis=1), jnp.float32)  # (K,2)


_DISK = _disk_offsets()


def _smooth(img):
    """5x5 box blur (the BRIEF pre-smoothing)."""
    k = jnp.ones((5, 5), img.dtype) / 25.0
    return jax.scipy.signal.convolve2d(img, k, mode="same")


def describe(img, uv, valid, oriented=True):
    """256-bit (optionally steered) BRIEF descriptors at uv (N,2).

    `oriented=True` computes the ORB intensity-centroid angle
    theta = atan2(m01, m10) over a radius-15 disk and rotates the
    sampling pattern by it (rotation-invariant matching).
    Returns (desc (N,8) uint32, ok (N,))."""
    H, W = img.shape
    sm = _smooth(img)

    def one(c, v):
        if oriented:
            # ORB moments on integer pixels of the disk around c
            px = jnp.clip(jnp.round(c[0] + _DISK[:, 0]).astype(jnp.int32), 0, W - 1)
            py = jnp.clip(jnp.round(c[1] + _DISK[:, 1]).astype(jnp.int32), 0, H - 1)
            inten = img[py, px]
            m10 = jnp.sum(_DISK[:, 0] * inten)
            m01 = jnp.sum(_DISK[:, 1] * inten)
            theta = jnp.arctan2(m01, m10)
            ct, st = jnp.cos(theta), jnp.sin(theta)
            R = jnp.array([[ct, -st], [st, ct]], jnp.float32)
            pat = jnp.einsum("ij,nkj->nki", R, _PATTERN)
        else:
            pat = _PATTERN
        # sample both endpoints of each pair (bilinear)
        pts = pat + c[None, None, :]  # (256,2,2) absolute xy
        x = jnp.clip(pts[..., 0], 0, W - 2)
        y = jnp.clip(pts[..., 1], 0, H - 2)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = x - x0
        fy = y - y0
        g = lambda yy, xx: sm[yy, xx]
        val = (
            g(y0, x0) * (1 - fx) * (1 - fy)
            + g(y0, x0 + 1) * fx * (1 - fy)
            + g(y0 + 1, x0) * (1 - fx) * fy
            + g(y0 + 1, x0 + 1) * fx * fy
        )  # (256,2)
        bits = (val[:, 0] < val[:, 1]).astype(jnp.uint32)  # (256,)
        words = bits.reshape(8, 32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        desc = jnp.sum(words << shifts[None, :], axis=1, dtype=jnp.uint32)
        # steered pattern can reach sqrt(2) * patch half
        margin = int(np.ceil(_PATCH_HALF * np.sqrt(2.0))) if oriented else _PATCH_HALF
        inb = (
            (c[0] > margin)
            & (c[0] < W - margin - 1)
            & (c[1] > margin)
            & (c[1] < H - margin - 1)
        )
        return desc, v & inb

    return jax.vmap(one)(uv, valid)


def hamming_match(d1, v1, d2, v2, ratio=0.75):
    """Mutual-best Hamming matching with ratio test.

    d1 (N1,8), d2 (N2,8) uint32. Returns idx2_for_1 (N1,) int32 (-1 = no
    match) — `robust_match`'s knn+ratio+symmetry, batched."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])  # (N1,N2,8)
    dist = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
    big = jnp.int32(10_000)
    dist = jnp.where(v1[:, None] & v2[None, :], dist, big)

    best2 = jnp.argmin(dist, axis=1)
    bestd = jnp.min(dist, axis=1)
    # second best for ratio test
    d_wo = dist.at[jnp.arange(dist.shape[0]), best2].set(big)
    second = jnp.min(d_wo, axis=1)
    ratio_ok = bestd < ratio * second
    # symmetry: 1's best in 2 must map back to 1
    best1_of_2 = jnp.argmin(dist, axis=0)  # (N2,)
    mutual = best1_of_2[best2] == jnp.arange(dist.shape[0])
    ok = ratio_ok & mutual & (bestd < big)
    return jnp.where(ok, best2, -1).astype(jnp.int32)


class DescriptorTracker:
    """TrackDescriptor-equivalent with the KLTTracker interface."""

    def __init__(
        self,
        intrinsics: np.ndarray,
        cam_model: int = 0,
        num_features: int = 150,
        grid: tuple = (8, 10),
        fast_thresh: float = 20.0,
        knn_ratio: float = 0.75,
        cam_id: int = 0,
    ):
        self.intrinsics = jnp.asarray(intrinsics, jnp.float32)
        self.cam_model = cam_model
        self.grid = grid
        self.fast_thresh = fast_thresh
        self.knn_ratio = knn_ratio
        self.cam_id = cam_id
        fx, fy = float(intrinsics[0]), float(intrinsics[1])
        self.ransac_thresh = 2.0 / max(fx, fy)
        self.prev = None  # (uv, desc, valid, ids)
        self.next_id = 0
        self._key = jax.random.PRNGKey(1)
        self._jit_detect = jax.jit(
            partial(self._detect, grid=grid, fast_thresh=fast_thresh)
        )
        self._jit_match = jax.jit(partial(hamming_match, ratio=knn_ratio))

    @staticmethod
    def _detect(img, *, grid, fast_thresh):
        score = fast_score(img, fast_thresh)
        uv, ok = grid_detect(
            score, grid[0], grid[1],
            jnp.zeros((1, 2), img.dtype), jnp.zeros(1, bool),
        )
        desc, ok2 = describe(img, uv, ok)
        return uv, desc, ok & ok2

    def feed(self, t: float, img: np.ndarray):
        img_j = jnp.asarray(img, jnp.float32)
        uv, desc, valid = self._jit_detect(img_j)
        n = uv.shape[0]
        ids = np.full(n, -1, np.int64)
        if self.prev is not None:
            p_uv, p_desc, p_valid, p_ids = self.prev
            m = self._jit_match(p_desc, p_valid, desc, valid)
            m = np.asarray(m)
            # RANSAC on the matched pairs
            src, dst = [], []
            pairs = [(i, j) for i, j in enumerate(m) if j >= 0]
            if len(pairs) >= 12:
                uv1 = np.asarray(p_uv)[[i for i, _ in pairs]]
                uv2 = np.asarray(uv)[[j for _, j in pairs]]
                uvn1 = cam_models.undistort(self.intrinsics, self.cam_model, jnp.asarray(uv1))
                uvn2 = cam_models.undistort(self.intrinsics, self.cam_model, jnp.asarray(uv2))
                self._key, sub = jax.random.split(self._key)
                inl = np.asarray(
                    ransac_fundamental(
                        uvn1, uvn2, jnp.ones(len(pairs), bool), sub, self.ransac_thresh
                    )
                )
                for (i, j), keep in zip(pairs, inl):
                    if keep:
                        ids[j] = p_ids[i]
        new = (ids < 0) & np.asarray(valid)
        n_new = int(new.sum())
        ids[new] = np.arange(self.next_id, self.next_id + n_new)
        self.next_id += n_new
        self.prev = (uv, desc, valid, ids)
        sel = np.asarray(valid) & (ids >= 0)
        return ids[sel], np.asarray(uv)[sel]
