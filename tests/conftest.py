import os

# Parity tests run on the CPU backend with x64 enabled; the TPU path is
# exercised by bench.py. A virtual 8-device mesh validates sharding.
# NOTE: the environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize registers that backend, so we must override via jax.config
# BEFORE any computation.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# ALSO export the cpu pin into the environment: several suites spawn the
# CLI (or 2-process multihost runs) via subprocess, and a child that
# inherits JAX_PLATFORMS=axon runs against the remote-TPU tunnel — slow
# when the tunnel is up and HUNG when it is down (observed: a gene-based
# CLI child stuck >7 min mid-suite during a tunnel outage).  The
# jax.config override below only covers THIS process.
if os.environ.get("JAX_PLATFORMS") in (None, "axon"):
    # override only the rig's remote-tunnel default — an explicitly
    # exported platform (e.g. a local chip) is honored
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("REGENIE_TPU_PLATFORM", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)

EXAMPLE_DIR = "/root/reference/example"

import pytest


@pytest.fixture(scope="session")
def example_dir():
    return EXAMPLE_DIR
