"""Benchmark: fused MSCKF filter-step throughput on one chip.

Prints ONE JSON line:
  {"metric": "filter_step_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 200.0}

Baseline anchor: the reference is a real-time CPU system at ~20 camera
fps (EuRoC); the driver target is >=10x real-time per chip => 200 fps
(BASELINE.md). vs_baseline = achieved_fps / 200.

Execution model: T frames are staged on-device and executed by ONE
jitted `lax.scan` over the fused per-frame step (marginalize ->
propagate+clone -> batched MSCKF update) — the deployment shape for
offline/batch processing, and it amortizes host<->device dispatch.

Precision: f32 compute (validated against f64 on the simulator: same
ATE, NEES ~3), f64 time axis. Config mirrors EuRoC defaults: 11-clone
window (+1 ring slot), 40 MSCKF features, mono, 20+2 IMU samples per
0.1 s frame padded to 24.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import uvio_tpu  # noqa: F401  (x64 + cache config)
    from functools import partial

    from uvio_tpu.pipeline import StepConfig, filter_step
    from uvio_tpu.types import StateLayout, init_state

    layout = StateLayout(max_clones=12, max_imu_batch=24, max_slam=0)
    cfg = StepConfig(layout=layout, sigma_pix=1.0)
    F, K, C, M = 40, layout.max_clones, layout.num_cams, layout.max_imu_batch
    T = 100  # frames per scan dispatch

    rng = np.random.default_rng(0)
    state = init_state(layout, dtype=jnp.float32)
    state = state.replace(
        time=jnp.asarray(0.0, jnp.float64),
        cov=jnp.asarray(np.eye(layout.dim) * 1e-4, jnp.float32),
        calib_cam_intr=jnp.asarray(
            np.tile([458.0, 458.0, 367.0, 248.0, 0, 0, 0, 0], (C, 1)), jnp.float32
        ),
    )

    def stage_frames(t0):
        dt = 0.1
        ts = t0 + np.arange(T)[:, None] * dt + np.linspace(0, dt, M)[None, :]
        imu_t = jnp.asarray(ts)  # (T,M) f64
        imu_w = jnp.asarray(0.1 * rng.standard_normal((T, M, 3)), jnp.float32)
        imu_a = jnp.asarray(
            np.tile([0.0, 0.0, 9.81], (T, M, 1)) + 0.2 * rng.standard_normal((T, M, 3)),
            jnp.float32,
        )
        uv = jnp.asarray(rng.uniform(100, 600, (T, F, K, C, 2)), jnp.float32)
        mask = jnp.asarray(rng.uniform(size=(T, F, K, C)) < 0.6)
        return imu_t, imu_w, imu_a, uv, mask

    def run_chunk(state, frames):
        def body(st, fr):
            st, info = filter_step(st, *fr, cfg=cfg)
            return st, info["num_used"]

        return jax.lax.scan(body, state, frames)

    # (no donation: init_state shares zero buffers between leaves, which
    # trips XLA's double-donation check)
    run = jax.jit(run_chunk)

    frames0 = stage_frames(0.0)
    state, _ = run(state, frames0)
    jax.block_until_ready(state.cov)  # compile + warmup (fills window)

    n_chunks = 5
    chunks = [stage_frames(100.0 * (i + 1)) for i in range(n_chunks)]
    t0 = time.time()
    for ch in chunks:
        state, used = run(state, ch)
    jax.block_until_ready(state.cov)
    dt_total = time.time() - t0
    fps = n_chunks * T / dt_total

    print(
        json.dumps(
            {
                "metric": "filter_step_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 200.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
