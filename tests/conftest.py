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

# Persistent XLA compilation cache: the suite's wall time is dominated by
# recompiling the same CPU graphs every run (VERDICT r4 #4); caching them
# across runs keeps the inner loop fast. First run on a fresh box pays
# full compile cost either way. LIBZL_TPU_NO_COMPILE_CACHE=1 disables
# (e.g. to measure cold-compile time).
if not os.environ.get("LIBZL_TPU_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/libzl_tpu_test_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
