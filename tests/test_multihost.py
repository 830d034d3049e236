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
    # Periodic eval stays ENABLED under --multihost (every process
    # evaluates the full val set redundantly so the collective "best"
    # save is entered in lockstep) — the multi arm exercises it.
    eval_overrides = ["train.eval_every_steps=2", "train.eval_protocol=fixed"]
    single = _losses(
        launch(num_processes=1, devices_per_process=8, steps=2,
               workdir=str(tmp_path / "single"))
    )
    multi_log = launch(num_processes=2, devices_per_process=4, steps=2,
                       workdir=str(tmp_path / "multi"),
                       overrides_extra=eval_overrides)
    multi = _losses(multi_log)
    assert set(single) == set(multi) == {1, 2}
    for step in (1, 2):
        assert multi[step] == pytest.approx(single[step], rel=1e-5), (
            step, single, multi,
        )
    # periodic eval ran under multihost and logged a val metric
    with open(multi_log) as f:
        recs = [json.loads(line) for line in f]
    assert any("val_metric" in r for r in recs), recs
    # the multihost run really checkpointed (orbax multiprocess save)
    saver = tmp_path / "multi" / "saver" / "norm"
    assert os.path.isdir(saver) and any(
        p.isdigit() for p in os.listdir(saver)
    )
    # ... including the "best" checkpoint from the in-loop eval
    best = tmp_path / "multi" / "saver" / "best"
    assert os.path.isdir(best) and any(
        p.isdigit() for p in os.listdir(best)
    )
