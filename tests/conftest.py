"""Test configuration: CPU platform with 8 virtual devices for sharding tests,
f64 enabled before jax initializes.

Note: the harness environment registers a TPU ('axon') PJRT plugin via
sitecustomize and sets JAX_PLATFORMS=axon, which overrides env-var attempts to
select CPU; jax.config.update('jax_platforms', ...) wins, so we use that.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
