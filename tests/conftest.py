"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The container's sitecustomize registers the remote `axon` TPU backend in
every interpreter and overrides JAX_PLATFORMS; `jax.config.update` below
wins over it.  Multi-chip sharding tests run on 8 virtual CPU devices.

Set PORTRAYER_TEST_PLATFORM=tpu to run the suite against the real TPU
backend instead — that enables the @pytest.mark.tpu tests (non-interpreted
Mosaic kernel compilation), which are skipped on CPU.
"""

import os

_platform = os.environ.get("PORTRAYER_TEST_PLATFORM", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if _platform == "cpu" and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "golden: golden-image comparison")
    config.addinivalue_line("markers", "tpu: requires a real TPU backend")
