"""Test harness: force an 8-device CPU mesh so sharding tests run without a
TPU pod (SURVEY §4: multi-host tests via forced multi-device CPU meshes)."""
import os

# force CPU even when the ambient environment selects a TPU platform: unit
# tests must be runnable anywhere, and sharding tests need 8 virtual devices
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by the interpreter's sitecustomize with a TPU
# platform snapshotted from the env — override through the live config too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

