"""Test configuration: force an 8-device virtual CPU mesh BEFORE any JAX
backend initializes.

This is the TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4 implication (e)): sharding/collective code paths run against
``--xla_force_host_platform_device_count=8`` on CPU.

Note: this environment's ``sitecustomize`` imports jax at interpreter
startup (to register the TPU PJRT plugin), so plain env-var assignment here
is too late for ``JAX_PLATFORMS`` — ``jax.config.update`` still works
because backends initialize lazily on first use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
