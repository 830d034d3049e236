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


def _vals(log_path):
    with open(log_path) as f:
        recs = [json.loads(line) for line in f]
    return {int(r["step"]): r["val_metric"] for r in recs if "val_metric" in r}


def test_two_process_train_matches_single_process(tmp_path):
    # Periodic eval is ENABLED on BOTH arms: under --multihost the val
    # set is PROCESS-SHARDED (each process scores its DatasetShard block
    # and the integer confusion matrices sum across processes), so the
    # multi arm's val_metric must reproduce the single-controller arm's
    # full-set eval — sharded eval == replicated eval.
    eval_overrides = ["train.eval_every_steps=2", "train.eval_protocol=fixed"]
    single_log = launch(num_processes=1, devices_per_process=8, steps=2,
                        workdir=str(tmp_path / "single"),
                        overrides_extra=eval_overrides)
    single = _losses(single_log)
    multi_log = launch(num_processes=2, devices_per_process=4, steps=2,
                       workdir=str(tmp_path / "multi"),
                       overrides_extra=eval_overrides)
    multi = _losses(multi_log)
    assert set(single) == set(multi) == {1, 2}
    for step in (1, 2):
        assert multi[step] == pytest.approx(single[step], rel=1e-5), (
            step, single, multi,
        )
    # process-sharded eval reproduces the single-controller full-set eval
    # (tolerance only for cross-partitioning ulp drift in the forward)
    single_val, multi_val = _vals(single_log), _vals(multi_log)
    assert set(multi_val) == {2} and set(single_val) == {2}
    assert multi_val[2] == pytest.approx(single_val[2], abs=1e-6), (
        single_val, multi_val,
    )
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


def test_four_process_dryrun(tmp_path):
    """4-process DCN dryrun (round-3 VERDICT missing #2: the runtime was
    only ever validated at 2 processes): 4 processes x 2 virtual CPU
    devices join one 8-device mesh, train 2 steps with process-sharded
    periodic eval, and checkpoint collectively."""
    log_path = launch(num_processes=4, devices_per_process=2, steps=2,
                      workdir=str(tmp_path / "quad"),
                      overrides_extra=["train.eval_every_steps=2",
                                      "train.eval_protocol=fixed"])
    losses = _losses(log_path)
    assert set(losses) == {1, 2}
    assert all(v == v and v < 1e4 for v in losses.values())  # finite
    vals = _vals(log_path)
    assert set(vals) == {2} and 0.0 <= vals[2] <= 1.0
    saver = tmp_path / "quad" / "saver" / "norm"
    assert saver.is_dir() and any(p.isdigit() for p in os.listdir(saver))


def test_sharded_confusion_sums_to_full():
    """The sharded-eval contract, exactly: summing DatasetShard partial
    confusion matrices over any shard count reproduces the full-set
    matrix bit-for-bit (both protocols), hence identical mIoU."""
    import jax
    import numpy as np

    from em_adapt_tpu.config import DataConfig, ExperimentConfig, ModelConfig
    from em_adapt_tpu.data.pipeline import (
        DatasetShard,
        LearnableSyntheticVOC,
        batch_iterator,
    )
    from em_adapt_tpu.eval.miou import miou_from_confusion
    from em_adapt_tpu.eval.predict import Evaluator

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8),
        data=DataConfig(input_size=(33, 33), num_workers=2),
    )
    from em_adapt_tpu.models import DeepLabLargeFOV

    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    ev = Evaluator(cfg, model)
    ds = LearnableSyntheticVOC(n=7, num_classes=4, seed=3, category="val",
                               image_size=33)

    full_voc = ev.confusion_voc(params, ds, use_crf=False, batch_size=2)
    # 3 shards of 7 -> blocks of 3/2/2 (uneven on purpose)
    parts = [
        ev.confusion_voc(params, DatasetShard(ds, s, 3), use_crf=False,
                         batch_size=2)
        for s in range(3)
    ]
    np.testing.assert_array_equal(sum(parts), full_voc)
    assert miou_from_confusion(sum(parts))[0] == miou_from_confusion(full_voc)[0]

    def batches(d):
        return batch_iterator(d, cfg.data, batch_size=2, seed=0, epochs=1,
                              train=False, drop_remainder=False,
                              pad_remainder=True)

    full_fixed = ev.confusion_fixed(params, batches(ds))
    parts_fixed = [
        ev.confusion_fixed(params, batches(DatasetShard(ds, s, 3)))
        for s in range(3)
    ]
    np.testing.assert_array_equal(sum(parts_fixed), full_fixed)


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


def test_two_process_preempt_resume_bitexact(tmp_path):
    """Round-4 VERDICT weak #3: the uniform-shutdown flag's deadlock
    rationale (utils/failure.py::requested_uniform — the preemption save
    is a COLLECTIVE orbax save) proven in anger: both processes take a
    SIGTERM mid-run, must complete the collective save and exit rc=0,
    and the --resume'd loss stream must equal the uninterrupted
    control's bit-for-bit at every common step."""
    from tools.multihost_dryrun import launch_preempt_resume

    result = launch_preempt_resume(
        num_processes=2, steps=24, preempt_after_step=4,
        devices_per_process=4, workdir=str(tmp_path / "pre"),
    )
    assert result["loss_mismatches"] == []
    assert result["post_resume_overlap_records"] >= 2, result
    assert result["resume_step"] >= 4
    assert result["pass"] is True


def test_committed_multihost_preempt_artifact():
    """MULTIHOST_PREEMPT.json (tools/multihost_dryrun.py --preempt):
    recompute the bit-exactness contract from the recorded raw streams
    instead of trusting the stored pass flag."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTIHOST_PREEMPT.json")
    if not os.path.exists(path):
        pytest.skip("run `python tools/multihost_dryrun.py --preempt`")
    with open(path) as f:
        art = json.load(f)
    control = dict((int(s), v) for s, v in art["loss_stream_control"])
    preempt = dict((int(s), v) for s, v in art["loss_stream_preempt"])
    common = sorted(set(control) & set(preempt))
    assert len(common) == art["steps"]
    assert all(control[s] == preempt[s] for s in common)
    post = [s for s in common if s > art["resume_step"]]
    assert len(post) >= 2
    assert art["pass"] is True
