"""Test config: force CPU JAX with 8 virtual devices so multi-chip sharding
(mesh/pjit/shard_map paths) is exercised without TPU hardware.

NOTE: this environment ships a TPU PJRT plugin that overrides the
JAX_PLATFORMS env var, so the platform must be pinned through jax.config
(the XLA_FLAGS device-count flag still must be in the env before the CPU
client is created)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
