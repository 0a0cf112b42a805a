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

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (the reference splits its tests into four
    executables for the same reason, test/CMakeLists.txt): `pytest -q`
    runs the fast tier; tests marked `slow` (statistical sweeps,
    distributed mesh lattices) need RBT_FULL_SUITE=1 or an explicit
    -m selection."""
    if os.environ.get("RBT_FULL_SUITE"):
        return
    if config.getoption("-m"):
        return  # user picked markers explicitly; don't second-guess
    skip_slow = pytest.mark.skip(
        reason="slow tier: set RBT_FULL_SUITE=1 (or -m slow) to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
