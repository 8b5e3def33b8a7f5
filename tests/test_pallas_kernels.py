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
