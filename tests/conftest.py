"""Test harness: force an 8-device virtual CPU mesh.

The axon TPU plugin registers at interpreter startup (sitecustomize), so
JAX_PLATFORMS must be overridden at runtime, and the host-device-count flag
must land before the CPU backend initializes.

Set UNIREC_TEST_PLATFORM=tpu to run a (subset of the) suite against the
real chip instead — used to record compiled-Mosaic evidence for the Pallas
kernel tests, which the CPU suite only exercises in interpret mode. Tests
that require the 8-device mesh skip themselves on a 1-chip run via the
``jax.device_count()`` checks they already carry.
"""
import os

_TEST_PLATFORM = os.environ.get("UNIREC_TEST_PLATFORM", "cpu")

if _TEST_PLATFORM == "cpu":
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if _TEST_PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    # kernel tests compare Pallas outputs against XLA references; on TPU the
    # default f32 matmul runs as fast bf16 passes, which would make the
    # REFERENCE the imprecise side. True-f32 references keep the tolerances
    # meaningful.
    jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    """Fail loudly if anything imported at collection time flipped the
    platform off the 8-device CPU mesh (e.g. a bench script applying a
    shell JAX_PLATFORMS=axon override at import) — otherwise the whole
    suite silently runs on the 1-chip TPU and mesh tests break."""
    if _TEST_PLATFORM != "cpu":
        assert jax.default_backend() == _TEST_PLATFORM, (
            f"UNIREC_TEST_PLATFORM={_TEST_PLATFORM} but backend is "
            f"{jax.default_backend()!r}")
        yield
        return
    assert jax.default_backend() == "cpu", (
        f"test suite must run on the virtual CPU mesh, got "
        f"{jax.default_backend()!r} — some import mutated jax_platforms")
    assert jax.device_count() == 8, (
        f"expected 8 forced CPU devices, got {jax.device_count()}")
    yield


@pytest.fixture(scope="session")
def synth_dataset(tmp_path_factory):
    from tests.synth import generate
    root = tmp_path_factory.mktemp("synth")
    info = generate(str(root))
    return str(root), info
