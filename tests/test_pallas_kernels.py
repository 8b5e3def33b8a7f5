"""Pallas frontend kernels vs their XLA reference implementations
(interpret mode on CPU; the driver/TPU runs the compiled path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from uvio_tpu.frontend.klt import fast_score
from uvio_tpu.frontend.pallas_kernels import fast_score_pallas


@pytest.mark.parametrize(
    "shape", [(64, 96), (100, 130), (128, 128), (480, 752), (65, 257)]
)
def test_fast_score_pallas_matches_xla(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    img = jnp.asarray(rng.uniform(0, 255, shape).astype(np.float32))
    a = np.asarray(fast_score(img, 20.0))
    b = np.asarray(fast_score_pallas(img, 20.0, interpret=True))
    assert np.abs(a - b).max() < 1e-4, np.abs(a - b).max()
    assert (a > 0).sum() > 0  # test images actually produce corners


def test_fast_score_pallas_threshold():
    """A synthetic bright dot must be detected at matching thresholds."""
    img = np.zeros((32, 128), np.float32)
    img[16, 64] = 200.0  # isolated bright pixel: ring all darker
    out = np.asarray(fast_score_pallas(jnp.asarray(img), 20.0, interpret=True))
    assert out[16, 64] > 0
    out_hi = np.asarray(fast_score_pallas(jnp.asarray(img), 250.0, interpret=True))
    assert out_hi[16, 64] == 0


def _lk_scene(seed=0, H=120, W=160, N=32, shift=(2, -1)):
    from scipy.signal import convolve2d

    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (H // 4 + 4, W // 4 + 4))
    img1 = np.kron(base, np.ones((4, 4)))[:H, :W]
    img1 = convolve2d(img1, np.ones((3, 3)) / 9, mode="same")
    img2 = np.roll(img1, (shift[1], shift[0]), axis=(0, 1))
    uv = np.stack([rng.uniform(20, W - 20, N), rng.uniform(20, H - 20, N)], 1)
    return img1, img2, uv


def test_lk_level_pallas_matches_xla():
    """Per-level LK kernel vs the vmapped XLA path: identical ok masks,
    sub-1e-4-px agreement, true flow recovered."""
    from uvio_tpu.frontend.klt import lk_level
    from uvio_tpu.frontend.pallas_kernels import lk_level_pallas

    img1, img2, uv = _lk_scene()
    valid = np.ones(len(uv), bool)
    uv1, ok1 = lk_level(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(uv),
        jnp.asarray(uv), jnp.asarray(valid),
    )
    uv2, ok2 = lk_level_pallas(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(uv),
        jnp.asarray(uv), jnp.asarray(valid), interpret=True,
    )
    uv1, ok1, uv2, ok2 = map(np.asarray, (uv1, ok1, uv2, ok2))
    assert (ok1 == ok2).all()
    assert ok2.sum() >= 24
    assert np.abs(uv1[ok1 & ok2] - uv2[ok1 & ok2]).max() < 1e-4
    flow = np.median(uv2[ok2] - uv[ok2], axis=0)
    np.testing.assert_allclose(flow, [2.0, -1.0], atol=0.05)


@pytest.mark.parametrize(
    "H,W",
    [
        (30, 160),   # level shorter than the 40-row search slab
                     # (e.g. top pyramid level of a 240-row image)
        (34, 160),   # H % 8 == 2, taller than the template slab only
        (370, 256),  # H % 8 == 2 at full-image scale (bottom-edge
                     # features used to overrun the slab rows)
    ],
)
def test_lk_level_pallas_short_and_unaligned_heights(H, W):
    """Regression: row-aligned DMA bases must stay in range for levels
    shorter than the slabs and for H % 8 >= 2 bottom-edge features."""
    from uvio_tpu.frontend.klt import lk_level
    from uvio_tpu.frontend.pallas_kernels import lk_level_pallas

    img1, img2, _ = _lk_scene(seed=H, H=max(H, 48), W=W, N=4, shift=(1, 1))
    img1, img2 = img1[:H], img2[:H]
    rng = np.random.default_rng(H)
    # features on the bottom edge of the valid template range
    uv = np.stack(
        [rng.uniform(20, W - 20, 16), np.linspace(H - 10.0, H - 9.0, 16)], 1
    )
    valid = np.ones(len(uv), bool)
    uv1, ok1 = lk_level(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(uv),
        jnp.asarray(uv), jnp.asarray(valid),
    )
    uv2, ok2 = lk_level_pallas(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(uv),
        jnp.asarray(uv), jnp.asarray(valid), interpret=True,
    )
    uv1, ok1, uv2, ok2 = map(np.asarray, (uv1, ok1, uv2, ok2))
    both = ok1 & ok2
    # tracks the XLA path keeps must agree; pallas may drop extras only
    # via its documented search-margin restriction, not corruption
    if both.any():
        assert np.abs(uv1[both] - uv2[both]).max() < 1e-3
    assert not np.isnan(uv2).any()


def test_lk_level_pallas_border_and_invalid():
    """Features near borders fail cleanly; invalid stay invalid."""
    from uvio_tpu.frontend.pallas_kernels import lk_level_pallas

    img1, img2, uv = _lk_scene()
    uv[0] = (2.0, 2.0)      # template window out of bounds
    uv[1] = (157.0, 117.0)  # bottom-right corner
    valid = np.ones(len(uv), bool)
    valid[2] = False
    uv2, ok2 = lk_level_pallas(
        jnp.asarray(img1), jnp.asarray(img2), jnp.asarray(uv),
        jnp.asarray(uv), jnp.asarray(valid), interpret=True,
    )
    ok2 = np.asarray(ok2)
    assert not ok2[0] and not ok2[1] and not ok2[2]
