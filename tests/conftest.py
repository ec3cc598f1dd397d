"""Test configuration: run JAX on 8 virtual CPU devices.

Must set flags before jax initializes — this gives every test a fake
8-device mesh so the shard_map tile renderer is exercised without TPU
hardware (SURVEY.md §4 "multi-device without a cluster").
"""

import os

# Force CPU: the ambient environment points JAX_PLATFORMS at the remote
# TPU tunnel, which would make every test compile remotely.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: repeat test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
