"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
`--xla_force_host_platform_device_count=8` (the TPU-native answer to testing
distributed code without a cluster — the reference has no such story at all,
see SURVEY.md §4).
"""
import os

# Force CPU for tests even when the session environment pins a TPU platform
# (override with FIDM_TPU_TEST_BACKEND=tpu to test on hardware).
_backend = os.environ.get("FIDM_TPU_TEST_BACKEND", "cpu")
os.environ["JAX_PLATFORMS"] = _backend
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Hermetic tests: the CLIs turn on jax's persistent compilation cache
# (fidm_tpu/utils/cache.py), which would couple test runs through
# ~/.cache and, on XLA:CPU, feed cache-deserialized executables into
# serialize_executable (broken on this build — see serving/aot.py).
# Tests that exercise the helper set the env vars explicitly.
os.environ.setdefault("FIDM_NO_COMPILATION_CACHE", "1")

import jax  # noqa: E402

# The axon sitecustomize pins the TPU platform regardless of JAX_PLATFORMS;
# jax.config.update after import is what actually takes effect.
jax.config.update("jax_platforms", _backend)

# This JAX build defaults to low-precision (bf16-pass) matmuls on every
# backend; numerical parity tests need true f32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
