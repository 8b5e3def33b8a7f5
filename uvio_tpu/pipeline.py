"""Fused per-frame filter step — the flagship jittable "model".

One device-side function covering the reference's
`do_feature_propagate_update` hot path (`VioManager.cpp:323-714`):

    [marginalize-if-full] -> propagate+clone -> batched MSCKF update

The step is a pure function of (state, frame tensors) and is the unit
that gets jitted, vmapped over sequence batches (Monte-Carlo / dataset
evaluation — the reference's `error_dataset` many-runs use case), and
sharded over a device mesh (data-parallel axis "dp").
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .filter.ekf import marginalize_clone
from .filter.propagator import NoiseManager, propagate_and_clone
from .types.layout import StateLayout
from .types.state import FilterState, oldest_clone_slot
from .update.msckf import msckf_update


@dataclasses.dataclass(frozen=True)
class StepConfig:
    layout: StateLayout
    cam_model: int = 0
    sigma_pix: float = 1.0
    chi2_mult: float = 1.0
    gravity_mag: float = 9.81
    noises: NoiseManager = dataclasses.field(default_factory=NoiseManager)


def filter_step(
    state: FilterState,
    imu_t: jnp.ndarray,
    imu_w: jnp.ndarray,
    imu_a: jnp.ndarray,
    obs_uv: jnp.ndarray,
    obs_mask: jnp.ndarray,
    *,
    cfg: StepConfig,
):
    """One camera-frame step. imu_* padded (M,)/(M,3); obs (F,K,C,2)."""
    L = cfg.layout

    def marg(s):
        return marginalize_clone(s, L, oldest_clone_slot(s, L))

    state = jax.lax.cond(
        jnp.all(state.clones_valid), marg, lambda s: s, state
    )
    state = propagate_and_clone(
        state, L, imu_t, imu_w, imu_a, cfg.noises, cfg.gravity_mag
    )
    state, info = msckf_update(
        state,
        L,
        cfg.cam_model,
        obs_uv,
        obs_mask,
        sigma_pix=cfg.sigma_pix,
        chi2_mult=cfg.chi2_mult,
    )
    return state, info


def make_step(cfg: StepConfig):
    """Jitted single-sequence step."""
    return jax.jit(partial(filter_step, cfg=cfg))


def make_batched_step(cfg: StepConfig, mesh=None):
    """vmapped step over a leading sequence-batch axis, optionally
    sharded over mesh axis "dp" (multi-chip Monte-Carlo / dataset eval).
    """
    fn = jax.vmap(partial(filter_step, cfg=cfg))
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("dp"))
    return jax.jit(fn, in_shardings=shard, out_shardings=shard)


class HostPipeline:
    """Double-buffered host->device frame ingestion.

    The reference overlaps sensor ingestion with estimation via a
    detached camera-processing thread (`UVIOROS1Visualizer.cpp:72-114`).
    The TPU-native equivalent: while the device executes chunk k, a
    background thread stages chunk k+1's frame tensors onto the device
    (`jax.device_put`), so host IO/staging never blocks the device.

    Usage:
        pipe = HostPipeline(chunk_source)   # iterator of frame pytrees
        for staged in pipe:                 # staged already on device
            state, out = run_chunk(state, staged)
    """

    def __init__(self, chunks, device=None, depth: int = 2):
        import queue
        import threading

        import jax

        self._q = queue.Queue(maxsize=depth)
        self._device = device or jax.devices()[0]
        self._sentinel = object()

        def worker():
            try:
                for c in chunks:
                    self._q.put(jax.device_put(c, self._device))
            finally:
                self._q.put(self._sentinel)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._sentinel:
                return
            yield item
