"""Test harness: force CPU with 8 virtual devices so multi-chip sharding is
exercised without a TPU slice (SURVEY.md §4 item (d))."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The axon TPU plugin registers itself even under JAX_PLATFORMS=cpu; force
# the default platform so tests always run on the 8 virtual CPU devices.
jax.config.update("jax_platform_name", "cpu")
