"""Test harness config: force a virtual 8-device CPU mesh so multi-chip
sharding is exercised without TPU hardware (mirrors how the reference's apex
distributed tests run multi-process single-node NCCL; see SURVEY.md §4).

Note: this machine's axon TPU plugin overrides the JAX_PLATFORMS env var, so
we must force the CPU platform through jax.config after import.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
