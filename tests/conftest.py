"""Test harness: force an 8-device virtual CPU platform before JAX initializes.

Emulates a v5e-8 slice for sharding tests without TPU hardware, per the
framework's multi-chip test strategy (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU platform
# CPU AOT cache entries are machine-feature specific (SIGILL risk across
# hosts); the suite recompiles instead of touching the persistent cache.
os.environ["ECGPAN_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize pre-registers the TPU backend and pins
# jax_platforms="axon,cpu" regardless of the env var; force CPU before any
# backend initializes so the suite runs on the 8-device virtual mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(123)
