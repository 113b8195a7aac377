"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host-platform virtual devices instead (same SPMD
partitioner, same collectives).  Set LUW_TEST_TPU=1 to run on real hardware.

Note: the hosted TPU platform plugin overrides the JAX_PLATFORMS env var, so
we must force the platform through jax.config before any backend initializes.
"""

import os

if not os.environ.get("LUW_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")
