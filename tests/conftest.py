"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere (SURVEY.md §4: multi-chip
paths are tested under --xla_force_host_platform_device_count=8).
"""

import os

# ORAG_TPU_TESTS=1 opts into the real-TPU guard tests
# (tests/test_tpu_compile_guard.py AOT-compiles the headline kernel
# shapes on the actual backend); everything else stays hermetic-CPU.
_USE_TPU = os.environ.get("ORAG_TPU_TESTS") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's boot hook (sitecustomize -> axon.register) force-sets
# jax_platforms="axon,cpu" via jax.config at interpreter start, which
# overrides the env var above — override it back before any backend init.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
