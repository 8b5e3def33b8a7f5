"""Data-parallel scaling of the filter pipeline over a device mesh.

Runs B independent sequence states through the vmapped fused filter
step, sharded over the mesh "dp" axis, and reports frames/s and scaling
efficiency vs a single device — the Monte-Carlo / dataset-evaluation
axis (the reference's `error_dataset` many-runs use case, executed as
one device program instead of N processes).

On a CPU host, run with a virtual mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/scaling.py
"""

import argparse
import time

import numpy as np


def run(n_devices: int, frames_per_chunk=50, n_chunks=4, seq_per_device=1):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from uvio_tpu.pipeline import StepConfig, filter_step
    from uvio_tpu.types import StateLayout, init_state

    layout = StateLayout(max_clones=12, max_imu_batch=24, max_slam=0)
    cfg = StepConfig(layout=layout)
    F, K, C, M = 40, layout.max_clones, layout.num_cams, layout.max_imu_batch
    B = n_devices * seq_per_device
    T = frames_per_chunk

    rng = np.random.default_rng(0)

    def one_state():
        s = init_state(layout, dtype=jnp.float32)
        return s.replace(
            time=jnp.asarray(0.0, jnp.float64),
            cov=jnp.asarray(np.eye(layout.dim) * 1e-4, jnp.float32),
            calib_cam_intr=jnp.asarray(
                np.tile([458.0, 458, 367, 248, 0, 0, 0, 0], (C, 1)), jnp.float32
            ),
        )

    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[one_state() for _ in range(B)])

    def frames(t0):
        dt = 0.1
        ts = t0 + np.arange(T)[None, :, None] * dt + np.linspace(0, dt, M)[None, None, :]
        return (
            jnp.asarray(np.tile(ts, (B, 1, 1))),
            jnp.asarray(0.1 * rng.standard_normal((B, T, M, 3)), jnp.float32),
            jnp.asarray(
                np.tile([0.0, 0, 9.81], (B, T, M, 1))
                + 0.2 * rng.standard_normal((B, T, M, 3)),
                jnp.float32,
            ),
            jnp.asarray(rng.uniform(100, 600, (B, T, F, K, C, 2)), jnp.float32),
            jnp.asarray(rng.uniform(size=(B, T, F, K, C)) < 0.6),
        )

    devs = np.array(jax.devices()[:n_devices])
    mesh = Mesh(devs, ("dp",))
    shard = NamedSharding(mesh, P("dp"))

    def chunk(states, fr):
        def per_seq(s, f):
            def body(st, one_frame):
                st, info = filter_step(st, *one_frame, cfg=cfg)
                return st, info["num_used"]

            return jax.lax.scan(body, s, f)

        return jax.vmap(per_seq)(states, fr)

    run_c = jax.jit(chunk, in_shardings=(shard, shard), out_shardings=(shard, shard))

    states = jax.device_put(states, shard)
    fr0 = jax.device_put(frames(0.0), shard)
    states, _ = run_c(states, fr0)
    jax.block_until_ready(states.cov)

    chs = [jax.device_put(frames(100.0 * (i + 1)), shard) for i in range(n_chunks)]
    t0 = time.time()
    for ch in chs:
        states, _ = run_c(states, ch)
    jax.block_until_ready(states.cov)
    wall = time.time() - t0
    fps = B * T * n_chunks / wall
    return fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-devices", type=int, default=None)
    args = ap.parse_args()
    import jax

    nd = len(jax.devices())
    if args.max_devices:
        nd = min(nd, args.max_devices)
    results = {}
    for n in [1, nd] if nd > 1 else [1]:
        results[n] = run(n)
    base = results[1]
    print(f"\n{'devices':>8} {'seq-frames/s':>14} {'speedup':>9} {'efficiency':>11}")
    for n, fps in results.items():
        print(f"{n:>8} {fps:>14.1f} {fps / base:>9.2f}x {fps / base / n:>10.1%}")


if __name__ == "__main__":
    main()
