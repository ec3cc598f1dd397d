"""Test configuration: run JAX on 8 virtual CPU devices.

The ambient environment registers a remote-TPU (axon) PJRT plugin from
sitecustomize at interpreter startup and sets JAX_PLATFORMS=axon *before*
conftest runs, so env vars are too late — use jax.config.update, which
takes effect at (re)backend-init. Every test then sees a fake 8-device
CPU mesh so the shard_map tile renderer is exercised without TPU hardware
(SURVEY.md §4 "multi-device without a cluster").
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: repeat test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
