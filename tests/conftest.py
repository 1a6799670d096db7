"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's graft entry;
unit tests validate numerics and sharding on host CPU so they are
deterministic and runnable anywhere.

Note: this image pre-imports jax and registers the `axon` TPU backend via
sitecustomize, so the env-var route (JAX_PLATFORMS) is already decided by the
time pytest runs. jax.config.update still works before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
