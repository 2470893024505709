"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The container's sitecustomize registers the remote `axon` TPU backend in
every interpreter and overrides JAX_PLATFORMS; `jax.config.update` below
wins over it.  Multi-chip sharding tests run on 8 virtual CPU devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
