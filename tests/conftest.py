"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding/pjit paths are exercised without TPU hardware.

The session environment pins JAX_PLATFORMS=axon (a remote TPU tunnel) and
its sitecustomize pre-imports jax, so plain env vars are not enough: we
update the live jax config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
