import os

# Parity tests run on the CPU backend with x64 enabled; the TPU path is
# exercised by bench.py. A virtual 8-device mesh validates sharding.
# NOTE: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize registers that backend, so we must override via jax.config
# BEFORE any computation.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

EXAMPLE_DIR = "/root/reference/example"

import pytest


@pytest.fixture(scope="session")
def example_dir():
    return EXAMPLE_DIR
