"""Test harness: force an 8-device virtual CPU mesh.

The axon TPU plugin registers at interpreter startup (sitecustomize), so
JAX_PLATFORMS must be overridden at runtime, and the host-device-count flag
must land before the CPU backend initializes.
"""
import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_dataset(tmp_path_factory):
    from tests.synth import generate
    root = tmp_path_factory.mktemp("synth")
    info = generate(str(root))
    return str(root), info
