"""Test config: force CPU with 8 virtual devices so multi-chip sharding
paths compile and run without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

CONNECTIVITY_DIR = "/root/reference/connectivity"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def connectivity_dir():
    return CONNECTIVITY_DIR
