"""Multi-host (DCN) runtime dryrun: 2 CPU processes, one global mesh.

SURVEY.md §5 names the JAX multi-controller runtime as the comm-backend
equivalent of the (absent) reference distribution layer. This test drives
the REAL `em-adapt train --multihost` path across 2 processes x 4 virtual
CPU devices (per-process data sharding, global-array assembly, the jitted
global-mesh train step with the cross-process gradient psum, orbax
multihost checkpointing) and checks numeric parity: with identical seeds
the 2-process run must reproduce the single-process (8-device) losses.
"""

import json
import os

import pytest

from tools.multihost_dryrun import launch


def _losses(log_path):
    with open(log_path) as f:
        recs = [json.loads(line) for line in f]
    return {int(r["step"]): r["loss"] for r in recs if "loss" in r}


def test_two_process_train_matches_single_process(tmp_path):
    single = _losses(
        launch(num_processes=1, devices_per_process=8, steps=2,
               workdir=str(tmp_path / "single"))
    )
    multi = _losses(
        launch(num_processes=2, devices_per_process=4, steps=2,
               workdir=str(tmp_path / "multi"))
    )
    assert set(single) == set(multi) == {1, 2}
    for step in (1, 2):
        assert multi[step] == pytest.approx(single[step], rel=1e-5), (
            step, single, multi,
        )
    # the multihost run really checkpointed (orbax multiprocess save)
    saver = tmp_path / "multi" / "saver" / "norm"
    assert os.path.isdir(saver) and any(
        p.isdigit() for p in os.listdir(saver)
    )
