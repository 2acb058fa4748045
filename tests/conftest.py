"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
(`jax.sharding.Mesh`) is exercised without TPU hardware, and keep math in fp32
for parity against the torch reference."""

import os

# Must run before jax initializes its backends.  Unconditional: the ambient
# environment points JAX at the (single, tunneled) TPU; tests want fast local
# CPU with a virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is NOT enough here: the ambient axon TPU plugin wins the
# platform race unless jax_platforms is set through the config before the
# first backend query.
jax.config.update("jax_platforms", "cpu")

# JAX's 'default' matmul/conv precision is reduced (bf16-like passes) even on
# CPU; parity tests against torch fp32 need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")
