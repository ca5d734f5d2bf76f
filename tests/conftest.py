"""Test config: force the CPU platform with 8 virtual devices so physics and
sharding/multi-chip tests run fast and without TPU hardware (SURVEY.md §4).

The environment's sitecustomize registers the axon TPU platform at
interpreter startup (jax_platforms="axon,cpu"), so setting JAX_PLATFORMS
before import is not enough — switch the config and drop any initialized
backends here instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_oige_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover - backends not yet initialized
    pass
