"""Driver-contract tests: __graft_entry__ entry() and dryrun_multichip()."""

import importlib.util
import os

import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_is_jittable():
    mod = _load()
    fn, example = mod.entry()
    out = jax.eval_shape(fn, *example)  # abstract trace == compile-checkable
    assert out.shape == (6, 41, 41, 21)


def test_dryrun_multichip_8():
    mod = _load()
    mod.dryrun_multichip(8)


def test_dryrun_multichip_4():
    mod = _load()
    mod.dryrun_multichip(4)
