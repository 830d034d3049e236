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


# --- shared golden-fixture plumbing -------------------------------------
# One loader for the committed E-step goldens and one handle on the TF1 op
# archive; three E-step test modules and two resize test modules consume
# these, so a fixture-schema change lands in exactly one place.

import glob  # noqa: E402

ESTEP_FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "estep_*.npz")))

# (name, target size) cases present in tf_ops.npz for the legacy resizes.
RESIZE_CASES = [
    ("down_label", (41, 41)),
    ("up_pred", (321, 321)),
    ("odd", (7, 5)),
    ("upscale", (23, 17)),
]


def load_estep_fixture(path):
    """Unpack one estep_*.npz golden: (scores, label, orders, out, kwargs).

    The kwargs dict mirrors the recorded reference-call parameters; any new
    key added by generate_goldens.py must be threaded through here so every
    implementation's parametrized parity test sees it.
    """
    z = np.load(path)
    kw = dict(
        bg_p=float(z["bg_p"]),
        fg_p=float(z["fg_p"]),
        num_iter=int(z["num_iter"]),
        suppress_others=bool(z["suppress"]),
        margin_others=float(z["margin"]),
    )
    return z["scores"], z["label"], z["orders"], z["out"], kw


@pytest.fixture(scope="session")
def tf_ops():
    """The tf_ops.npz golden archive (TF1 kernel outputs), opened once."""
    return np.load(os.path.join(FIXTURE_DIR, "tf_ops.npz"))
