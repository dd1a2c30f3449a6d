"""Test harness config: force CPU with 8 fake devices so mesh/shard_map/psum
tests run without a TPU slice (SURVEY.md §5 "Distributed tests without a
cluster").

Note: this environment's sitecustomize registers the axon TPU plugin and
overrides JAX_PLATFORMS at interpreter startup, so the env-var route doesn't
work; `jax.config.update("jax_platforms", "cpu")` after import does. XLA_FLAGS
is still read lazily when the CPU backend initializes, so the fake-device
count must be set before any jax.devices() call.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
