"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
(`jax.sharding.Mesh`) is exercised without TPU hardware, and keep math in fp32
for parity against the torch reference."""

import os

# Must run before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
