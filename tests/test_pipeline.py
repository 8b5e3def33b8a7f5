"""Host pipeline: double-buffered device staging."""

import numpy as np

import jax.numpy as jnp

from uvio_tpu.pipeline import HostPipeline


def test_host_pipeline_order_and_content():
    chunks = [
        {"a": np.full((4,), i, np.float32), "b": np.arange(i, i + 3)} for i in range(7)
    ]
    out = list(HostPipeline(iter(chunks), depth=2))
    assert len(out) == 7
    for i, c in enumerate(out):
        assert isinstance(c["a"], jnp.ndarray)
        np.testing.assert_array_equal(np.asarray(c["a"]), np.full((4,), i, np.float32))
        np.testing.assert_array_equal(np.asarray(c["b"]), np.arange(i, i + 3))


def test_host_pipeline_overlaps_consumer():
    """Producer keeps staging while the consumer is slow."""
    import time

    def slow_chunks():
        for i in range(4):
            yield np.full((2,), i, np.float32)

    pipe = HostPipeline(slow_chunks(), depth=2)
    it = iter(pipe)
    first = next(it)
    time.sleep(0.05)  # producer should have prefetched the next chunks
    assert pipe._q.qsize() >= 1
    rest = list(it)
    assert len(rest) == 3
    np.testing.assert_array_equal(np.asarray(first), [0, 0])
