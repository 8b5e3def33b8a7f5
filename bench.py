"""Benchmark: fused MSCKF filter-step throughput on one chip.

Prints ONE JSON line:
  {"metric": "filter_step_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 200.0}

Baseline anchor: the reference is a real-time CPU system at ~20 camera
fps (EuRoC); the driver target is >=10x real-time per chip => 200 fps
(BASELINE.md). vs_baseline = achieved_fps / 200.

Config mirrors the EuRoC estimator defaults: 11-clone window (+1 ring
slot), 40 MSCKF features per update, mono camera, 200 Hz IMU padded to
32 samples per frame (0.1 s @ 10 fps frame spacing would be 20+2).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import uvio_tpu  # noqa: F401  (x64 + cache config)
    from uvio_tpu.pipeline import StepConfig, filter_step
    from uvio_tpu.types import StateLayout, init_state
    from functools import partial

    layout = StateLayout(max_clones=12, max_imu_batch=32, max_slam=0)
    cfg = StepConfig(layout=layout, sigma_pix=1.0)
    F, K, C, M = 40, layout.max_clones, layout.num_cams, layout.max_imu_batch

    rng = np.random.default_rng(0)
    state = init_state(layout)
    state = state.replace(
        time=jnp.asarray(0.0),
        cov=jnp.asarray(np.eye(layout.dim) * 1e-4),
        calib_cam_intr=jnp.asarray(np.tile([458.0, 458.0, 367.0, 248.0, 0, 0, 0, 0], (C, 1))),
    )

    step = jax.jit(partial(filter_step, cfg=cfg), donate_argnums=0)

    def frame(i):
        dt = 0.1
        t0 = i * dt
        imu_t = jnp.asarray(np.linspace(t0, t0 + dt, M))
        imu_w = jnp.asarray(0.1 * rng.standard_normal((M, 3)))
        imu_a = jnp.asarray(np.tile([0.0, 0.0, 9.81], (M, 1)) + 0.2 * rng.standard_normal((M, 3)))
        uv = jnp.asarray(rng.uniform(100, 600, (F, K, C, 2)))
        mask = jnp.asarray(rng.uniform(size=(F, K, C)) < 0.6)
        return imu_t, imu_w, imu_a, uv, mask

    frames = [frame(i) for i in range(24)]
    # warmup: fill the clone window + compile
    for i in range(16):
        state, info = step(state, *frames[i % 24])
    jax.block_until_ready(state.cov)

    n_iters = 200
    t0 = time.time()
    for i in range(n_iters):
        state, info = step(state, *frames[i % 24])
    jax.block_until_ready(state.cov)
    dt_total = time.time() - t0
    fps = n_iters / dt_total

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
