"""Test harness configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip
sharding (mesh construction, pjit, collectives) is exercised without TPU
hardware — the standard fake-mesh trick (SURVEY.md §4). Environment must be
set before jax initializes, hence module import order matters here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments (e.g. the axon TPU relay) pre-import jax from a
# sitecustomize hook, making the env vars above too late; force the
# platform through the live config instead (backends are still lazy).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the model/trainer tests compile sizeable
# XLA programs; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixture_dir():
    return FIXTURE_DIR
