"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

This is the TPU-native analog of multi-node testing without a cluster
(SURVEY.md §4 implication (e)): sharding/collective code paths run against
``--xla_force_host_platform_device_count=8`` on CPU.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
