"""Test harness: force an 8-virtual-device CPU platform and float64.

Multi-chip sharding is validated on a host-emulated mesh
(xla_force_host_platform_device_count); correctness tests run in double
precision to match the reference's tolerance (reference:
src/Engine/LanczosDriver.h:29-33, RealType = double).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS at
# interpreter boot; the config update below wins over it as long as no
# backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
