"""Test configuration: force a deterministic 8-device virtual CPU mesh.

Sharding/pjit paths are validated on virtual CPU devices (the driver
separately dry-runs the multi-chip path); numerics tests want f64 CPU.
Must run before jax initializes its backends, hence env vars here.
"""

import os

# The image pins JAX_PLATFORMS=axon (real TPU tunnel) globally, and its
# sitecustomize re-forces it through jax.config at interpreter start; tests
# must run on the virtual CPU mesh — override the env var AND the config.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import uvio_tpu  # noqa: E402,F401  (enables x64)
