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


def test_launch_retry_keeps_logs_on_final_failure(tmp_path, monkeypatch, capsys):
    """Round-3 review finding: when every retry fails, launch() must NOT
    delete the workdir (the raised error references the per-process logs
    in it) and must not print a retry line for a retry that never runs."""
    import tools.multihost_dryrun as md

    workdir = tmp_path / "wd"
    calls = []

    def fake_launch_once(*a, **kw):
        # like the real _launch_once: (re)creates the workdir and writes
        # per-process logs before failing
        calls.append(1)
        workdir.mkdir(exist_ok=True)
        (workdir / "proc1.log").write_text("gloo: Connect timeout\n")
        err = RuntimeError("Gloo context initialization failed")
        err.gloo_timeout = True
        raise err

    monkeypatch.setattr(md, "_launch_once", fake_launch_once)
    with pytest.raises(RuntimeError, match="Gloo"):
        md.launch(num_processes=2, retries=1, workdir=str(workdir))
    assert len(calls) == 2  # first attempt + 1 retry
    # the final attempt's logs survive for diagnosis
    assert (workdir / "proc1.log").exists()
    err_out = capsys.readouterr().err
    assert err_out.count("retry") == 1 and "retry 1/1" in err_out
