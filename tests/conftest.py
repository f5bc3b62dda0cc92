"""Test configuration.

Unit tests run JAX on the CPU backend with 8 virtual devices so multi-chip
sharding paths compile and execute without TPU hardware — the analog of the
reference's CI strategy of exercising GPU code on lavapipe software Vulkan
(reference: .github/workflows/build.yml:66-90).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: integrator configs recompile otherwise.
# A CPU-ONLY directory: the TPU bench path's remote compiles can deposit
# CPU AOT entries built for a different host machine type, and loading
# those silently miscompiles (observed: a transform-edit test failing
# only after a cache hit, with XLA warning "could lead to execution
# errors such as SIGILL"). Never share this dir with TPU runs.
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/gatling_jax_cache_cpu"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin and overrides
# jax_platforms; unit tests must run on the virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import logging  # noqa: E402

import pytest  # noqa: E402

from gatling_tpu.utils.log import ErrorCountingHandler, init_logging  # noqa: E402


@pytest.fixture()
def fail_on_error_log():
    """Fail the test if anything was logged at ERROR level, mirroring the
    reference's quill error-counting test sink (hdGatling/main.cpp:78-100)."""
    handler = ErrorCountingHandler()
    logger = init_logging([handler])
    yield handler
    logger.removeHandler(handler)
    assert handler.error_count == 0, f"errors logged: {handler.messages}"
