"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware isn't available in CI; sharding correctness is
validated on host-platform virtual devices, mirroring how the driver
dry-runs the multi-chip path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: in this environment the axon TPU plugin ignores the JAX_PLATFORMS
# env var; jax.config.update is honored. Must run before any backend init.
# RBT_TPU_TESTS=1 keeps the default (TPU) backend so the hardware-gated
# tier (tests/test_tpu_hardware.py) can drive the real chip:
#   RBT_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q
if not os.environ.get("RBT_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
