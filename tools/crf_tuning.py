"""Domain-tuned denseCRF hyperparameter sweep (round-4 VERDICT task #1).

The reference's published number is "with denseCRF" (reference
readme.md:40; hyperparameters network.py:63), i.e. CRF-as-a-benefit is
part of the capability — but the only benefit measurement in this repo
(ACCURACY_COST.json) applied the VOC-tuned kernels (bilateral sxy=121 —
spanning the ENTIRE 129² synthetic frame) and found an honest negative
(−0.015/−0.019 mIoU, one near-dead class erased). That was one point in
a space nobody searched. This tool searches it:

* TUNE stream: LearnableSyntheticVOC seed 555 — disjoint from BOTH the
  checkpoint-selection stream (seed 0, the rehearsal's "best" race) and
  the measurement stream (seed 777, ACCURACY_COST.json).
* The model's softmax probabilities are computed ONCE per image (the CRF
  consumes probs; resweeping the network would re-pay ~60x the cost),
  exactly as evaluate_voc produces them: logits at the train input size,
  TF1-bilinear upsample to the original resolution, softmax
  (eval/predict.py::confusion_voc _post).
* Stage A grid: bilateral sxy x srgb x compat at scales matched to the
  129² domain (sxy 4..121 — the VOC value stays in the grid as the
  reference point), spatial kernel fixed at the reference (3, 3).
* Stage B: around stage A's best, sweep the spatial kernel + iterations.
* The best tune-stream setting is then applied ONCE to the measurement
  stream (same seed-777/64-image protocol as ACCURACY_COST.json) and the
  resulting delta is the committed answer to "can THIS CRF machinery
  improve a metric on this task?" — selection on the tune stream,
  measurement on the untouched stream, no peeking.

Artifact: CRF_TUNING.json (pinned by tests/test_crf_tuning.py).
Usage: python tools/crf_tuning.py [--checkpoint DIR[:TAG]] [--out F]
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import time


def _collect_probs(ev, params, ds, cfg):
    """[(probs HxWxC f32, rgb HxWx3 u8, label HxW)] for every image —
    the exact evaluate_voc pre-CRF pipeline, cached."""
    import numpy as np

    from em_adapt_tpu.data.augment import preprocess_eval, resize_bilinear_np

    import jax

    out = []
    batch, raws = [], []
    bs = cfg.eval.batch_size

    def flush():
        if not batch:
            return
        n = len(batch)
        stack = ev._pad_rows(np.stack(batch), bs)
        logits = jax.device_get(
            ev._jit_logits(params, ev._shard(stack))
        )
        for lg, (raw_img, raw_label) in zip(logits[:n], raws):
            oh, ow = raw_label.shape[:2]
            up = resize_bilinear_np(np.asarray(lg, np.float32), (oh, ow))
            e = np.exp(up - up.max(axis=-1, keepdims=True))
            out.append((e / e.sum(axis=-1, keepdims=True),
                        raw_img, raw_label))
        batch.clear()
        raws.clear()

    for i in range(len(ds)):
        raw_img, raw_label = ds.load_raw(i)
        img, _ = preprocess_eval(raw_img, None,
                                 input_size=cfg.model.input_size)
        batch.append(img)
        raws.append((raw_img, raw_label))
        if len(batch) == bs:
            flush()
    flush()
    return out


def _miou_for_setting(cached, eval_cfg, num_classes: int):
    """mIoU of argmax(dense_crf(probs)) over the cached stream; eval_cfg
    None scores the raw probs (the no-CRF baseline)."""
    from em_adapt_tpu.eval.crf import dense_crf
    from em_adapt_tpu.eval.miou import ConfusionAccumulator, miou_from_confusion

    acc = ConfusionAccumulator(num_classes)
    for probs, rgb, label in cached:
        q = probs if eval_cfg is None else dense_crf(probs, rgb, eval_cfg)
        acc.update_host(q.argmax(-1), label)
    miou, iou = miou_from_confusion(acc.matrix())
    return float(miou), [float(v) for v in iou]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None,
                    help="orbax checkpoint tree (DIR or DIR:TAG; default "
                         "tag 'best'); rehearsal geometry (4 classes, "
                         "129², fc6 64)")
    ap.add_argument("--tune-images", type=int, default=48)
    ap.add_argument("--val-images", type=int, default=64,
                    help="measurement stream size (matches "
                         "ACCURACY_COST.json's protocol)")
    ap.add_argument("--out", default="CRF_TUNING.json")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")

    from em_adapt_tpu.config import (
        DataConfig,
        EvalConfig,
        ExperimentConfig,
        ModelConfig,
    )
    from em_adapt_tpu.data.pipeline import LearnableSyntheticVOC
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.train import Trainer

    size = 129
    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(size, size),
                          fc6_channels=64, init_scheme="he"),
        data=DataConfig(input_size=(size, size), num_workers=2),
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

        ckpt_dir = tempfile.mkdtemp(prefix="em_crf_prior_")
        print("no --checkpoint: training a rehearsal prior (~7 min TPU)",
              flush=True)
        run_rehearsal(steps=2500, seed=0, refine_steps=0, save_dir=ckpt_dir)

    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.warm_start(trainer.init_state(), ckpt_dir, tag=tag)
    params = state.params
    ev = Evaluator(cfg, trainer.model)

    t0 = time.time()
    tune_ds = LearnableSyntheticVOC(n=args.tune_images, num_classes=4,
                                    seed=555, category="val",
                                    image_size=size)
    print(f"caching {len(tune_ds)} tune-stream prob maps ...", flush=True)
    tune = _collect_probs(ev, params, tune_ds, cfg)
    base_tune, base_tune_iou = _miou_for_setting(tune, None, 4)
    print(f"tune baseline (no CRF): {base_tune:.4f}", flush=True)

    def setting_cfg(**kw):
        # Start from the reference's VOC values (EvalConfig defaults =
        # reference network.py:63) and override per sweep point.
        return dataclasses.replace(EvalConfig(), **kw)

    sweep = []

    def probe(tag_name, **kw):
        miou, iou = _miou_for_setting(tune, setting_cfg(**kw), 4)
        rec = {"stage": tag_name, **kw, "tune_miou": round(miou, 4),
               "delta": round(miou - base_tune, 4)}
        sweep.append(rec)
        print(json.dumps(rec), flush=True)
        return miou

    # Stage A: bilateral kernel at domain-matched scales. sxy=121 (the
    # VOC value — spans the whole 129² frame) stays in as the reference
    # point; srgb covers sharper-to-softer color affinity; compat from
    # gentle to the VOC weight.
    stage_a = list(itertools.product(
        (4.0, 8.0, 16.0, 32.0, 64.0, 121.0),   # crf_bi_sxy
        (3.0, 5.0, 10.0),                      # crf_bi_srgb
        (1.0, 3.0, 10.0),                      # crf_bi_compat
    ))
    for sxy, srgb, compat in stage_a:
        probe("A", crf_bi_sxy=sxy, crf_bi_srgb=srgb, crf_bi_compat=compat)

    best_a = max((r for r in sweep if r["stage"] == "A"),
                 key=lambda r: r["tune_miou"])
    # Stage B: spatial kernel + iteration count around stage A's best.
    for g_sxy, g_compat in itertools.product((1.0, 2.0, 3.0, 5.0),
                                             (1.0, 3.0)):
        probe("B", crf_bi_sxy=best_a["crf_bi_sxy"],
              crf_bi_srgb=best_a["crf_bi_srgb"],
              crf_bi_compat=best_a["crf_bi_compat"],
              crf_g_sxy=g_sxy, crf_g_compat=g_compat)
    for iters in (2, 5):
        probe("B", crf_bi_sxy=best_a["crf_bi_sxy"],
              crf_bi_srgb=best_a["crf_bi_srgb"],
              crf_bi_compat=best_a["crf_bi_compat"],
              crf_iterations=iters)

    best = max(sweep, key=lambda r: r["tune_miou"])
    best_kw = {k: v for k, v in best.items()
               if k.startswith("crf_")}
    print(f"best tune setting: {best_kw} "
          f"(tune mIoU {best['tune_miou']:.4f} vs {base_tune:.4f})",
          flush=True)

    # Measurement: apply the tune-selected setting ONCE to the untouched
    # seed-777 stream (the ACCURACY_COST.json protocol).
    val_ds = LearnableSyntheticVOC(n=args.val_images, num_classes=4,
                                   seed=777, category="val",
                                   image_size=size)
    val = _collect_probs(ev, params, val_ds, cfg)
    base_val, base_val_iou = _miou_for_setting(val, None, 4)
    tuned_val, tuned_val_iou = _miou_for_setting(
        val, setting_cfg(**best_kw), 4
    )
    voc_val, voc_val_iou = _miou_for_setting(val, EvalConfig(), 4)

    result = {
        "task": "domain-tuned denseCRF sweep: select on a disjoint tune "
                "stream (seed 555), measure once on the untouched "
                "measurement stream (seed 777)",
        "checkpoint": {"dir": ckpt_dir, "tag": tag},
        "tune_images": args.tune_images,
        "val_images": args.val_images,
        "input_size": size,
        "seeds": {"selection": 0, "tune": 555, "measurement": 777},
        "tune_baseline_miou": round(base_tune, 4),
        "tune_baseline_per_class_iou": [round(v, 4) for v in base_tune_iou],
        "sweep": sweep,
        "best_setting": best_kw,
        "best_tune_miou": best["tune_miou"],
        "measurement": {
            "f32_miou": round(base_val, 4),
            "f32_per_class_iou": [round(v, 4) for v in base_val_iou],
            "crf_tuned_miou": round(tuned_val, 4),
            "crf_tuned_per_class_iou": [round(v, 4) for v in tuned_val_iou],
            "crf_voc_miou": round(voc_val, 4),
            "crf_voc_per_class_iou": [round(v, 4) for v in voc_val_iou],
            "delta_tuned": round(tuned_val - base_val, 4),
            "delta_voc": round(voc_val - base_val, 4),
        },
        "positive_control": bool(tuned_val > base_val),
        "elapsed_sec": round(time.time() - t0, 1),
        "platform": jax.devices()[0].platform,
    }
    # Contracts: the sweep really searched (the best tune setting beats
    # the VOC point on the tune stream unless VOC was already optimal),
    # and the measurement arm is reported whatever its sign.
    result["pass"] = bool(
        base_tune >= 0.30
        and len(sweep) >= 50
        and best["tune_miou"] >= max(
            r["tune_miou"] for r in sweep
            if r.get("crf_bi_sxy") == 121.0 and r.get("crf_bi_srgb") == 5.0
        )
    )
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "sweep"},
                     indent=1))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
