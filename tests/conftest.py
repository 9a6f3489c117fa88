"""Test config: force CPU backend with 8 virtual devices.

Mirrors the strategy in SURVEY.md §4: all tests run on jax[cpu] so CI needs
no TPU; multi-chip sharding is exercised on a virtual 8-device host mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# The environment's TPU plugin ignores JAX_PLATFORMS; the config flag wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop XLA executables between test modules.

    A single pytest process accumulates hundreds of CPU-backend
    executables across the suite; jaxlib's compiler has intermittently
    segfaulted near the end of such runs (observed twice at ~85%, in
    different tests, each fine in isolation). Modules rarely share
    compiled shapes, so clearing costs little wall time."""
    yield
    jax.clear_caches()
