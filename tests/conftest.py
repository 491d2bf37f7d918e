"""Test configuration: run everything on an 8-device virtual CPU mesh so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4d)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and forces
# jax_platforms="axon,cpu"; tests run on the virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
