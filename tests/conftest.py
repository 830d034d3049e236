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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def fixture_dir():
    return FIXTURE_DIR
