"""Test config: force CPU with 8 virtual devices so multi-chip sharding
paths compile and run without TPU hardware.

The container's sitecustomize registers the axon TPU backend at
interpreter startup, so we override via jax.config before any backend
initializes.  Set DASA_TEST_TPU=1 to run the suite on the real chip.
"""

import os

CONNECTIVITY_DIR = "/root/reference/connectivity"

if not os.environ.get("DASA_TEST_TPU"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def connectivity_dir():
    return CONNECTIVITY_DIR
