"""Worker shim for tools/multihost_dryrun.py.

Environments where a sitecustomize hook pre-imports jax (e.g. the axon
TPU relay) ignore JAX_PLATFORMS from the environment; force the CPU
backend through the live config (backends are still lazy at this point —
same trick as tests/conftest.py), then hand off to the real CLI so the
full ``em-adapt train --multihost`` path runs unchanged.
"""

import os
import sys

# Hermetic import: `python tools/_multihost_worker.py` puts tools/ (not
# the repo root) on sys.path, so without the editable pip install the
# `em_adapt_tpu` import below fails with ModuleNotFoundError. Insert the
# repo root explicitly so the worker runs in a fresh environment too.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from em_adapt_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
