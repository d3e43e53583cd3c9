"""Test config: force CPU with 8 virtual devices for sharding tests.

Mirrors the multi-chip validation strategy from SURVEY.md §4: kernels and
models are tested against pure-jnp references on a virtual 8-device CPU
mesh; real-TPU numbers come from bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env sets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment's sitecustomize force-registers the axon TPU backend even
# when JAX_PLATFORMS=cpu is set (jax is imported at interpreter start, before
# this file runs). Backends initialize lazily, so overriding the config here
# still wins as long as no computation has happened yet.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated test runs skip XLA recompiles.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
