"""Test harness: run JAX on a virtual 8-device CPU mesh.

This is the TPU-substitute for distributed tests (SURVEY.md section 4): every
multi-device test sees 8 XLA host devices.
"""

import os

# NOTE: JAX_PLATFORMS is ignored when the axon TPU plugin is present;
# JAX_PLATFORM_NAME does force the CPU backend.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Works even if jax was imported earlier, as long as no backend is live yet.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: grad-of-transformer compiles dominate test
# time on CPU; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
