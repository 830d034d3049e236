"""End-to-end rehearsal of the real VOC workflow on a miniature on-disk
dataset: convert -> file-backed pipeline -> EM training -> VOC-protocol
eval -> original-resolution prediction. This is the exact user path of the
reference (convert.py, then deeplab.py train, then external eval) in one
test, minus the 10,582 real images.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from em_adapt_tpu.config import (  # noqa: E402
    CheckpointConfig,
    DataConfig,
    EStepConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    """Build a miniature VOC2012-layout tree: JPEGs + RGB-coded masks that
    go through the convert tool, plus txt split lists."""
    from PIL import Image

    from em_adapt_tpu.data.voc import VOC_PALETTE, convert_dataset

    root = tmp_path_factory.mktemp("pascal")
    main = root / "VOCdevkit" / "VOC2012"
    (main / "JPEGImages").mkdir(parents=True)
    (main / "SegmentationClass").mkdir(parents=True)
    (root / "txt").mkdir()

    g = np.random.default_rng(0)
    ids = {"train": [], "val": []}
    for split, n in (("train", 8), ("val", 3)):
        for i in range(n):
            img_id = f"2012_{split}{i:03d}"
            ids[split].append(img_id)
            h = int(g.integers(60, 120))
            w = int(g.integers(60, 120))
            img = g.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(main / "JPEGImages" / f"{img_id}.jpg")
            # RGB-coded mask with 2-3 classes + void border
            mask = np.zeros((h, w, 3), np.uint8)
            c1, c2 = g.integers(1, 21, size=2)
            mask[: h // 2] = VOC_PALETTE[int(c1)]
            mask[h // 2 :, : w // 2] = VOC_PALETTE[int(c2)]
            mask[0, :] = (224, 224, 192)
            Image.fromarray(mask).save(main / "SegmentationClass" / f"{img_id}.png")
        (root / "txt" / f"{split}.txt").write_text("\n".join(ids[split]) + "\n")

    convert_dataset(
        str(main / "SegmentationClass"), None,
        str(main / "SegmentationClassAug"), log=lambda *a: None,
    )
    return root, main


def test_full_voc_workflow(voc_tree, tmp_path):
    root, main = voc_tree
    from em_adapt_tpu.data import VOCSegmentation, batch_iterator
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.train import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=21, input_size=(33, 33), fc6_channels=8),
        data=DataConfig(
            main_path=str(main), list_dir=str(root / "txt"),
            input_size=(33, 33), num_workers=2,
        ),
        estep=EStepConfig(num_iter=2),
        optim=OptimConfig(accum_steps=2, lr_schedule=()),
        train=TrainConfig(batch_size=8, epochs=4, log_every_steps=2),
        checkpoint=CheckpointConfig(
            save_dir=str(tmp_path / "saver"), save_every_steps=100, async_save=False
        ),
    )

    train_ds = VOCSegmentation(cfg.data, "train")
    assert len(train_ds) == 8
    img, lab = train_ds.load_raw(0)
    assert img.ndim == 3 and lab.ndim == 2
    assert set(np.unique(lab)) <= set(range(21)) | {255}

    trainer = Trainer(cfg, steps_per_epoch=max(len(train_ds) // 8, 1))
    state = trainer.init_state()
    logs = []
    batches = batch_iterator(train_ds, cfg.data, batch_size=8, seed=0, epochs=None)
    state = trainer.fit(state, batches, log_fn=logs.append)
    assert int(jax.device_get(state.step)) == 4
    assert logs and np.isfinite(logs[-1]["loss"])

    # VOC-protocol eval at original resolutions (all different sizes).
    val_ds = VOCSegmentation(cfg.data, "val")
    ev = Evaluator(cfg, trainer.model)
    miou, iou = ev.evaluate_voc(state.params, val_ds, use_crf=False, batch_size=2)
    assert 0.0 <= miou <= 1.0
    assert len(iou) == 21

    trainer.checkpointer.save(state, tag="norm")
    trainer.checkpointer.wait()
    assert trainer.checkpointer.latest_step("norm") == 4
    trainer.checkpointer.close()


def test_train_cli_production_knobs(voc_tree, tmp_path):
    """Drive `em-adapt train` end-to-end on the miniature tree with the
    production performance knobs: uint8 wire + host-shrunk labels +
    macro-fused steps + rbg RNG."""
    from em_adapt_tpu import cli

    root, main = voc_tree
    log = tmp_path / "m.jsonl"
    rc = cli.main([
        "train", "--steps", "4", "--log-jsonl", str(log),
        "model.num_classes=21", "model.input_size=(33,33)",
        "model.fc6_channels=8",
        f"data.main_path={main}", f"data.list_dir={root / 'txt'}",
        "data.input_size=(33,33)", "data.num_workers=2",
        "data.wire_dtype=uint8", "data.train_label_size=(5,5)",
        "estep.num_iter=2", "optim.accum_steps=2",
        "train.batch_size=8", "train.log_every_steps=2",
        "train.macro_steps=2", "train.rng_impl=rbg",
        f"checkpoint.save_dir={tmp_path / 'saver'}",
        "checkpoint.save_every_steps=1000000", "checkpoint.async_save=False",
    ])
    assert rc == 0
    import json

    recs = [json.loads(line) for line in log.read_text().splitlines()]
    assert recs and all(np.isfinite(r["loss"]) for r in recs if "loss" in r)
    assert recs[-1]["step"] == 4
    # BASELINE.md observability: every train record carries the measured
    # E-step µs/image startup-calibration constant
    # (train.calibrate_estep default; _calib = not a live per-step timing)
    assert all(
        r["estep_us_per_image_calib"] > 0 for r in recs if "loss" in r
    ), recs


def test_train_cli_periodic_voc_eval_saves_best(voc_tree, tmp_path):
    """Periodic eval with the exact-VOC protocol (train.eval_protocol=voc)
    runs during training and tracks a 'best' checkpoint."""
    from em_adapt_tpu import cli

    root, main = voc_tree
    log = tmp_path / "ev.jsonl"
    rc = cli.main([
        "train", "--steps", "4", "--log-jsonl", str(log),
        "model.num_classes=21", "model.input_size=(33,33)",
        "model.fc6_channels=8",
        f"data.main_path={main}", f"data.list_dir={root / 'txt'}",
        "data.input_size=(33,33)", "data.num_workers=2",
        "estep.num_iter=2", "optim.accum_steps=2",
        "train.batch_size=8", "train.log_every_steps=10",
        "train.eval_every_steps=2", "train.eval_protocol=voc",
        "eval.batch_size=2",
        f"checkpoint.save_dir={tmp_path / 'saver'}",
        "checkpoint.save_every_steps=1000000", "checkpoint.async_save=False",
    ])
    assert rc == 0
    import json

    recs = [json.loads(line) for line in log.read_text().splitlines()]
    vals = [r for r in recs if "val_metric" in r]
    assert vals and all(0.0 <= r["val_metric"] <= 1.0 for r in vals)
    assert os.path.isdir(tmp_path / "saver" / "best")


def test_train_cli_resume(voc_tree, tmp_path):
    """`em-adapt train --resume` continues from the latest checkpoint
    (reference 'resume' was warm-start-only; here the full state —
    optimizer slots, step, schedule position — comes back)."""
    from em_adapt_tpu import cli

    root, main = voc_tree
    common = [
        "model.num_classes=21", "model.input_size=(33,33)",
        "model.fc6_channels=8",
        f"data.main_path={main}", f"data.list_dir={root / 'txt'}",
        "data.input_size=(33,33)", "data.num_workers=2",
        "estep.num_iter=2", "optim.accum_steps=2",
        "train.batch_size=8", "train.log_every_steps=1",
        f"checkpoint.save_dir={tmp_path / 'saver'}",
        "checkpoint.save_every_steps=1000000", "checkpoint.async_save=False",
    ]
    assert cli.main(["train", "--steps", "2"] + common) == 0
    log = tmp_path / "resume.jsonl"
    assert cli.main(
        ["train", "--resume", "--steps", "4", "--log-jsonl", str(log)] + common
    ) == 0
    import json

    recs = [json.loads(line) for line in log.read_text().splitlines()]
    steps = [r["step"] for r in recs if "loss" in r]
    assert steps == [3, 4], steps  # continued from step 2, not from 0


def test_predict_cli_on_voc_images(voc_tree, tmp_path):
    """Drive the serving CLI end-to-end on the miniature tree."""
    from em_adapt_tpu import cli

    root, main = voc_tree
    img = str(main / "JPEGImages" / "2012_val000.jpg")
    out = tmp_path / "preds"
    rc = cli.main([
        "predict", img, "--out", str(out),
        "--config",
        "model.num_classes=21", "model.input_size=(33,33)", "model.fc6_channels=8",
        f"checkpoint.save_dir={tmp_path / 'nock'}",
    ])
    assert rc == 0
    from PIL import Image

    mask = Image.open(out / "2012_val000.png")
    assert mask.mode == "P"
    orig = Image.open(img)
    assert mask.size == orig.size


def test_predict_cli_batches_many_images(voc_tree, tmp_path, capsys):
    """Multiple inputs ride the chunked dispatch path (eval.batch_size=2
    over 3 images: one full chunk + a zero-padded tail chunk) and every
    mask still lands at its own image's ORIGINAL resolution, reported in
    input order."""
    from em_adapt_tpu import cli

    root, main = voc_tree
    imgs = [
        str(main / "JPEGImages" / f"2012_val{i:03d}.jpg") for i in range(3)
    ]
    out = tmp_path / "preds_batched"
    rc = cli.main([
        "predict", *imgs, "--out", str(out),
        "--config",
        "model.num_classes=21", "model.input_size=(33,33)",
        "model.fc6_channels=8", "eval.batch_size=2",
        f"checkpoint.save_dir={tmp_path / 'nock'}",
    ])
    assert rc == 0
    from PIL import Image

    for i in range(3):
        mask = Image.open(out / f"2012_val{i:03d}.png")
        assert mask.mode == "P"
        assert mask.size == Image.open(imgs[i]).size
    lines = [
        ln for ln in capsys.readouterr().out.splitlines() if " -> " in ln
    ]
    assert [ln.split(" -> ")[0] for ln in lines] == imgs


def test_train_cli_fold_preset_scales_batch_and_warns(tmp_path, capsys):
    """tpu-perf-fold on a multi-chip data mesh: the preset's GLOBAL
    batch_size auto-scales to 30 per data shard (unless the user
    overrides train.batch_size), and combining the fold with
    semi-supervised training prints the non-equivalence warning (the
    strong-path CE normalizes per batch — pinned by
    tests/test_trainer.py::test_fold_not_equivalent_for_strong_path_
    with_voids)."""
    from em_adapt_tpu import cli

    rc = cli.main([
        "train", "--steps", "1", "--preset", "tpu-perf-fold",
        "--synthetic", "120", "--strong-fraction", "0.5",
        "model.num_classes=4", "model.input_size=(33,33)",
        "model.fc6_channels=8", "data.input_size=(33,33)",
        "data.train_label_size=(5,5)", "estep.num_iter=1",
        "train.macro_steps=1", "train.log_every_steps=1",
        "mesh.axes=(('data',2),('space',1),('model',4))",
        f"checkpoint.save_dir={tmp_path / 'saver'}",
        "checkpoint.save_every_steps=1000000",
        "checkpoint.async_save=False",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "global batch_size 60 (30 per shard)" in out
    assert "NOT update-identical" in out

    # An explicit batch_size override wins over the auto-scaling.
    rc = cli.main([
        "train", "--steps", "1", "--preset", "tpu-perf-fold",
        "--synthetic", "60",
        "model.num_classes=4", "model.input_size=(33,33)",
        "model.fc6_channels=8", "data.input_size=(33,33)",
        "data.train_label_size=(5,5)", "estep.num_iter=1",
        "train.macro_steps=1", "train.batch_size=8",
        "mesh.axes=(('data',2),('space',1),('model',4))",
        f"checkpoint.save_dir={tmp_path / 'saver2'}",
        "checkpoint.save_every_steps=1000000",
        "checkpoint.async_save=False",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "30 per shard" not in out


def test_fold_preset_resolves_auto_data_axis():
    """The fold preset's per-shard batch scaling must resolve the mesh's
    -1 = "all remaining devices" convention (the DEFAULT MeshConfig is
    (('data', -1), ('space', 1))): reading the raw tuple would see -1
    and silently skip the scaling exactly on the multi-chip default."""
    from em_adapt_tpu.cli import _resolved_data_axis
    from em_adapt_tpu.config import ExperimentConfig, MeshConfig

    cfg = ExperimentConfig()  # data=-1 default
    assert _resolved_data_axis(cfg, 8) == 8
    assert _resolved_data_axis(cfg, 1) == 1

    cfg2 = ExperimentConfig(mesh=MeshConfig(
        axes=(("data", 2), ("space", 1), ("model", 4))))
    assert _resolved_data_axis(cfg2, 8) == 2

    cfg3 = ExperimentConfig(mesh=MeshConfig(
        axes=(("data", -1), ("space", 2))))
    assert _resolved_data_axis(cfg3, 8) == 4

    # Unresolvable -1 (devices not divisible by fixed axes): no scaling;
    # make_mesh raises the real error later.
    cfg4 = ExperimentConfig(mesh=MeshConfig(
        axes=(("data", -1), ("space", 3))))
    assert _resolved_data_axis(cfg4, 8) == 1


def test_train_cli_synthetic_learnable_with_strong_and_eval(tmp_path):
    """The schedule-rehearsal CLI surface: --synthetic-learnable routes
    training AND the periodic-eval val set to LearnableSyntheticVOC
    (blob size following data.input_size), --synthetic-val sizes the val
    set, and --strong-fraction flips on semi-supervised EM over it."""
    import json

    from em_adapt_tpu import cli

    log = tmp_path / "learn.jsonl"
    rc = cli.main([
        "train", "--synthetic", "16", "--synthetic-learnable",
        "--synthetic-val", "4", "--strong-fraction", "0.25",
        "--steps", "4", "--log-jsonl", str(log),
        "model.num_classes=4", "model.input_size=(33,33)",
        "model.fc6_channels=8", "model.init_scheme=he",
        "data.input_size=(33,33)", "data.num_workers=2",
        "estep.num_iter=2", "optim.accum_steps=1",
        "train.batch_size=8", "train.log_every_steps=2",
        "train.eval_every_steps=2", "train.eval_protocol=voc",
        "train.calibrate_estep=false",
        f"checkpoint.save_dir={tmp_path / 'saver'}",
        "checkpoint.save_every_steps=1000000", "checkpoint.async_save=False",
    ])
    assert rc == 0
    recs = [json.loads(line) for line in open(log)]
    assert any("val_metric" in r for r in recs), recs
    import numpy as np

    assert all(np.isfinite(r["loss"]) for r in recs if "loss" in r)
    # the best race ran over the learnable val set
    best = tmp_path / "saver" / "best"
    assert best.is_dir() and any(p.isdigit() for p in os.listdir(best))


def test_train_cli_rejects_nonpositive_synthetic_val():
    """An explicit --synthetic-val 0 used to silently fall through `or`
    to the size/4 default (advisor finding, round 4); now it is an
    eager argument error, before any device work."""
    from em_adapt_tpu import cli

    rc = cli.main([
        "train", "--synthetic", "8", "--synthetic-val", "0",
        "--steps", "1", "train.eval_every_steps=1",
    ])
    assert rc == 2
