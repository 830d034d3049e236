"""Command-line entry points.

The reference's CLI is ``python deeplab.py <gpu_id>`` with every
hyperparameter hardcoded in __main__ (reference deeplab.py:287-294) and a
separate ``python convert.py`` prep script (reference convert.py). Here
one typed CLI covers the same surface and more:

    em-adapt train   [--synthetic N] [--resume] [key=value ...]
    em-adapt eval    [--crf] [--checkpoint DIR] [key=value ...]
    em-adapt convert --voc-seg DIR --sbd-cls DIR --out DIR
    em-adapt import-tf PREFIX --out DIR   # reference Saver ckpt -> here
    em-adapt info

Overrides use dotted config paths, e.g.:
    em-adapt train optim.base_lr=5e-4 train.batch_size=8 data.length=64
Device selection is JAX-native (JAX_PLATFORMS / mesh config), replacing
the reference's CUDA_VISIBLE_DEVICES argv hack (reference deeplab.py:3).
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="em-adapt",
        description="TPU-native EM-Adapt weakly-supervised segmentation",
    )
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="run EM training")
    t.add_argument("--synthetic", type=int, default=None, metavar="N",
                   help="train on N synthetic images instead of VOC on disk")
    t.add_argument("--synthetic-learnable", action="store_true",
                   help="with --synthetic: use the LEARNABLE color-blob "
                        "task (LearnableSyntheticVOC — EM training lifts "
                        "val mIoU above chance) instead of random noise "
                        "images; blob size follows data.input_size")
    t.add_argument("--synthetic-val", type=int, default=None, metavar="N",
                   help="with --synthetic: size of the synthetic val set "
                        "for periodic eval (default: train size / 4)")
    t.add_argument("--resume", action="store_true",
                   help="resume from the latest 'norm' checkpoint")
    t.add_argument("--warm-start", default=None, metavar="DIR[:STEP]",
                   help="params-only warm start from the checkpoint tree at "
                        "DIR (optionally a specific :STEP): load weights, "
                        "keep FRESH optimizer slots / step 0 / LR schedule — "
                        "the reference's model_path fine-tune semantics "
                        "(reference deeplab.py:229-234). Mutually exclusive "
                        "with --resume (which restores the full state).")
    t.add_argument("--warm-start-tag", default="norm",
                   choices=("norm", "lr", "best"),
                   help="with --warm-start: checkpoint tag to load from")
    t.add_argument("--steps", type=int, default=None,
                   help="cap total microbatch steps (smoke runs)")
    t.add_argument("--log-jsonl", default=None, help="also write metrics JSONL here")
    t.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the first steps")
    t.add_argument("--preset",
                   choices=("reference", "tpu-perf", "tpu-perf-fold",
                            "tpu-highres"),
                   default="reference",
                   help="config preset applied BEFORE overrides: "
                        "'reference' = the reference's exact recipe "
                        "(f32, single-step dispatch); 'tpu-perf' = the "
                        "reference's batch-6 x accum-5 granularity with "
                        "the TPU execution levers (bf16 MXU compute, "
                        "10-step fused dispatch, TPU hardware RNG, "
                        "compact uint8 wire + score-map labels — "
                        "115.2 img/s/chip on v5e, PROFILE.md); "
                        "'tpu-perf-fold' = the same effective-batch-30 "
                        "recipe FOLDED into one batch-30 step, accum 1 "
                        "(same update math for the weak-supervision "
                        "recipe — tests/test_trainer.py::"
                        "test_folded_batch_matches_accumulation — at "
                        "batch-30 MFU: ~174 img/s/chip; NOT equivalent "
                        "under --strong-list: the strong-path masked CE "
                        "normalizes per batch, the CLI warns); "
                        "'tpu-highres' = tpu-perf execution levers at "
                        "513² input with spatial partitioning (mesh "
                        "space=3: -56-58%% per-device activation memory, "
                        "SPATIAL.json) + per-block rematerialization — "
                        "the measured when-to-use recipe for >=513² "
                        "multi-chip runs (labels ship full-res: the "
                        "score map is 65², not 41²)")
    t.add_argument("--device-data", type=int, default=None, metavar="N",
                   help="smoke/bench mode: pre-upload N batches and cycle "
                        "them on device, isolating step throughput from "
                        "host decode + H2D bandwidth (this dev rig's relay "
                        "moves ~12 MB/s; real TPU hosts move GB/s)")
    t.add_argument("--strong-list", default=None, metavar="TXT",
                   help="semi-supervised EM: ids in this list train on their "
                        "real pixel masks (E-step bypassed for them)")
    t.add_argument("--strong-fraction", type=float, default=0.0,
                   help="with --synthetic: fraction of strongly-labeled images")
    t.add_argument("--multihost", action="store_true",
                   help="multi-host (DCN) training: call "
                        "jax.distributed.initialize() so every host joins the "
                        "global mesh (coordinator/process env vars per the "
                        "standard JAX multi-controller runtime)")
    t.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="with --multihost: explicit coordinator address "
                        "(default: auto-detect from the cluster environment)")
    t.add_argument("--num-processes", type=int, default=None,
                   help="with --coordinator: total process count")
    t.add_argument("--process-id", type=int, default=None,
                   help="with --coordinator: this process's id")
    t.add_argument("overrides", nargs="*", help="config overrides key=value")

    e = sub.add_parser("eval", help="evaluate mIoU on the val split")
    e.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (default: config checkpoint.save_dir)")
    e.add_argument("--crf", action="store_true", help="denseCRF post-processing")
    e.add_argument("--synthetic", type=int, default=None, metavar="N")
    e.add_argument("--int8", action="store_true",
                   help="post-training-quantized int8 serving path "
                   "(calibrated on the first eval batch; see "
                   "eval/quantize.py)")
    e.add_argument("--fixed-size", action="store_true",
                   help="evaluate at the training resolution (fast path)")
    e.add_argument("overrides", nargs="*", help="config overrides key=value")

    c = sub.add_parser("convert", help="build SegmentationClassAug masks")
    c.add_argument("--voc-seg", default=None, help="VOC SegmentationClass dir")
    c.add_argument("--sbd-cls", default=None, help="SBD benchmark cls dir")
    c.add_argument("--out", required=True, help="output SegmentationClassAug dir")

    pr = sub.add_parser(
        "predict", help="segment images -> palette PNG masks (serving path)"
    )
    pr.add_argument("inputs", nargs="+", help="image files (jpg/png)")
    pr.add_argument("--out", required=True, help="output directory for masks")
    pr.add_argument("--checkpoint", default=None, help="checkpoint dir")
    pr.add_argument("--crf", action="store_true", help="denseCRF refinement")
    pr.add_argument("--int8", action="store_true",
                    help="post-training-quantized int8 serving path "
                    "(calibrated on the inputs themselves)")
    pr.add_argument("--overlay", action="store_true",
                    help="also write RGB color overlays next to the masks")
    pr.add_argument("--config", dest="overrides", nargs="*", default=[],
                    help="config overrides key=value")

    ex = sub.add_parser(
        "export", help="serialize the predict fn as a StableHLO artifact, "
        "or the weights as a reference-format init.npy"
    )
    ex.add_argument("--out", required=True,
                    help="output path (.stablehlo or .npy)")
    ex.add_argument("--checkpoint", default=None, help="checkpoint dir")
    ex.add_argument("--batch-size", type=int, default=None)
    ex.add_argument("--int8", action="store_true",
                    help="quantize before StableHLO export (int8 serving "
                    "artifact; calibrated on synthetic preprocessed-range "
                    "data unless --calib-images is given)")
    ex.add_argument("--calib-images", nargs="*", default=None,
                    metavar="IMG", help="calibration images for --int8")
    ex.add_argument("--format", choices=("stablehlo", "npy"),
                    default="stablehlo",
                    help="'npy' writes the reference's init.npy interchange "
                    "format ({layer: {w: HWIO, b}}, reference "
                    "deeplab.py:126-129) so trained weights can warm-start "
                    "the reference implementation")
    ex.add_argument("--config", dest="overrides", nargs="*", default=[],
                    help="config overrides key=value")

    it = sub.add_parser(
        "import-tf",
        help="convert a reference tf.train.Saver checkpoint (trainable "
        "variables, flat '<layer>_weights'/'<layer>_bias' names) into an "
        "orbax checkpoint usable with train --warm-start / eval "
        "--checkpoint / predict / export",
    )
    it.add_argument("prefix",
                    help="Saver prefix, e.g. saver/norm-24000 (no "
                    ".index/.data suffix)")
    it.add_argument("--out", required=True,
                    help="orbax checkpoint dir to write (tag 'norm', step "
                    "0 — a params-only warm-start source)")
    it.add_argument("--config", dest="overrides", nargs="*", default=[],
                    help="config overrides key=value (must match the "
                    "checkpoint's architecture)")

    sub.add_parser("info", help="print config defaults and device info")
    return p


def _load_cfg(overrides):
    from em_adapt_tpu.config import ExperimentConfig, apply_overrides

    return apply_overrides(ExperimentConfig(), overrides or [])


def _resolved_data_axis(cfg, n_devices: int) -> int:
    """Size the mesh's data axis will take, via the same resolution
    make_mesh uses (parallel/mesh.py::resolve_axis_sizes). The DEFAULT
    MeshConfig is (("data", -1), ("space", 1)), so reading the raw tuple
    would see -1 — not the 8 a v5e-8 resolves to. An unresolvable mesh
    returns 1 (no scaling); make_mesh raises the real error later."""
    from em_adapt_tpu.parallel.mesh import resolve_axis_sizes

    try:
        sizes = resolve_axis_sizes(cfg.mesh, n_devices)
    except ValueError:
        return 1
    return max(sizes.get(cfg.mesh.data_axis, 1), 1)


def _setup_jax() -> None:
    """Persistent XLA compilation cache (fresh jits on a remote TPU cost
    minutes; cache them across CLI invocations). Override the location
    with EM_ADAPT_JAX_CACHE; set it empty to disable."""
    import jax

    cache = os.environ.get("EM_ADAPT_JAX_CACHE", "/tmp/em_adapt_jax_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _parse_warm_start(spec: str) -> tuple[str, int | None]:
    """Split 'DIR[:STEP]' — a trailing ':<int>' is a step, anything else
    (including drive-letter-free paths containing ':') is the directory."""
    wdir, sep, suffix = spec.rpartition(":")
    if sep and wdir and suffix.isdigit():
        return wdir, int(suffix)
    return spec, None


def _load_inference_params(trainer, cfg, verb: str):
    """Shared eval/predict/export restore: params-only via the
    warm_start machinery — inference does not need optimizer slots, so a
    checkpoint written under a DIFFERENT optimizer config (e.g. a
    rehearsal run with accum_steps=1) loads fine where the full-state
    template restore would fail on the opt_state tree mismatch. Returns
    the state (fresh init when no checkpoint exists)."""
    state = trainer.init_state()
    latest = trainer.checkpointer.latest_step("norm")
    if latest is not None:
        state = trainer.warm_start(state, cfg.checkpoint.save_dir)
        print(f"{verb} checkpoint step {latest}")
    else:
        print(f"warning: no checkpoint found; {verb} fresh init")
    return state


def train_presets() -> dict[str, list[str]]:
    """Named override bundles applied BEFORE the user's dotted overrides
    (see the --preset help for the measured numbers behind each)."""
    _tpu_perf = [
        "model.compute_dtype=bfloat16",
        "train.macro_steps=10",
        "train.rng_impl=rbg",
        "data.wire_dtype=uint8",
        "data.train_label_size=(41,41)",
    ]
    return {
        "reference": [],
        "tpu-perf": _tpu_perf,
        # The reference's effective batch 30 (6 x accum 5) folded into one
        # batch-30 step — same update trajectory for the weak-supervision
        # recipe (see the preset help), at batch-30 MFU. batch_size is
        # GLOBAL; on a multi-chip data mesh it is auto-scaled to
        # 30 x data-axis in cmd_train unless explicitly overridden.
        "tpu-perf-fold": _tpu_perf + [
            "train.batch_size=30",
            "optim.accum_steps=1",
        ],
        # The SPATIAL.json when-to-use recipe productized (round-4
        # review): >=513² inputs on a multi-chip mesh want space=3
        # (-56-58% per-device activation memory for 125-199 MB/step of
        # halo collective-permutes) plus per-block remat. Labels ship
        # full-res — the 513² score map is 65², not tpu-perf's 41².
        "tpu-highres": [
            "model.compute_dtype=bfloat16",
            "train.macro_steps=10",
            "train.rng_impl=rbg",
            "data.wire_dtype=uint8",
            "model.input_size=(513,513)",
            "model.remat=true",
            'mesh.axes=(("data",-1),("space",3))',
        ],
    }


def cmd_train(args) -> int:
    import jax

    if args.warm_start and args.resume:
        # Trivially checkable: fail before any Trainer/device work (a
        # remote-TPU init costs minutes on this rig).
        print("error: --warm-start and --resume are mutually exclusive",
              file=sys.stderr)
        return 2
    _sv = getattr(args, "synthetic_val", None)
    if _sv is not None and _sv <= 0:
        # An explicit 0 used to fall through `or` to the size/4 default
        # (advisor finding, round 4): reject non-positive sizes eagerly.
        print(f"error: --synthetic-val must be positive, got {_sv} "
              "(omit the flag for the size/4 default, or drop "
              "train.eval_every_steps to disable eval)",
              file=sys.stderr)
        return 2
    _setup_jax()

    if getattr(args, "multihost", False):
        # Multi-host (DCN) runtime: each host contributes its local chips to
        # one global mesh; XLA routes the gradient psum over ICI within a
        # slice and DCN across slices. Coordinator address/process id come
        # from the standard JAX env (auto-detected on Cloud TPU) or from
        # the explicit --coordinator/--num-processes/--process-id flags
        # (CPU dryruns, bespoke clusters).
        if args.coordinator:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()

    from em_adapt_tpu.data import SyntheticVOC, VOCSegmentation, batch_iterator
    from em_adapt_tpu.train import Trainer
    from em_adapt_tpu.utils import MetricLogger, trace_context

    is_main = jax.process_index() == 0
    process_shard = (jax.process_index(), jax.process_count())
    preset = train_presets()[getattr(args, "preset", "reference")]
    cfg = _load_cfg(preset + list(args.overrides or []))
    if args.strong_list or args.strong_fraction > 0:
        cfg = cfg.replace(semi_supervised=True)
    if getattr(args, "preset", "reference") == "tpu-perf-fold":
        from em_adapt_tpu.config import apply_overrides

        user_keys = {o.partition("=")[0] for o in (args.overrides or [])}
        data_ax = _resolved_data_axis(cfg, jax.device_count())
        if data_ax > 1 and "train.batch_size" not in user_keys:
            # batch_size is GLOBAL: keep the folded recipe's 30 images per
            # data shard on a multi-chip mesh (bench.py does the same).
            cfg = apply_overrides(cfg, [f"train.batch_size={30 * data_ax}"])
            if is_main:
                print(f"tpu-perf-fold: data axis {data_ax} -> global "
                      f"batch_size {cfg.train.batch_size} (30 per shard)")
        if cfg.semi_supervised and is_main:
            print("WARNING: tpu-perf-fold with semi-supervised training is "
                  "NOT update-identical to the batch-6 x accum-5 recipe: "
                  "the strong-path CE normalizes by each batch's valid "
                  "(non-255) pixel count, so the batch-30 mean differs from "
                  "the mean of five batch-6 means whenever microbatches "
                  "carry different numbers of void pixels. Use --preset "
                  "tpu-perf for exact accumulation semantics.")
    if args.synthetic and getattr(args, "synthetic_learnable", False):
        from em_adapt_tpu.data.pipeline import LearnableSyntheticVOC

        ds = LearnableSyntheticVOC(
            n=args.synthetic, num_classes=cfg.model.num_classes,
            seed=cfg.train.seed, image_size=cfg.data.input_size[0],
            strong_fraction=args.strong_fraction,
        )
    elif args.synthetic:
        ds = SyntheticVOC(n=args.synthetic, num_classes=cfg.model.num_classes,
                          seed=cfg.train.seed, strong_fraction=args.strong_fraction)
    else:
        ds = VOCSegmentation(cfg.data, "train", strong_list=args.strong_list)
    steps_per_epoch = max(len(ds) // cfg.train.batch_size, 1)
    if is_main:
        print(f"dataset: {len(ds)} images, {steps_per_epoch} steps/epoch, "
              f"devices: {jax.device_count()} ({jax.devices()[0].platform}), "
              f"processes: {jax.process_count()}")

    trainer = Trainer(cfg, steps_per_epoch=steps_per_epoch)
    state = trainer.init_state()
    if args.warm_start:
        wdir, wstep = _parse_warm_start(args.warm_start)
        state = trainer.warm_start(
            state, wdir, tag=args.warm_start_tag, step=wstep
        )
        if is_main:
            print(f"warm start: params from {wdir} "
                  f"(tag={args.warm_start_tag}, step={wstep if wstep is not None else 'latest'}); "
                  f"optimizer/step/LR fresh")
    if args.resume:
        latest = trainer.checkpointer.latest_step("norm")
        if jax.process_count() > 1:
            # The resume DECISION gates a collective orbax restore, so it
            # must be process-uniform even when save_dir is a per-host
            # filesystem where only process 0 has the checkpoints (the
            # same discipline as the best-metric sidecar broadcast,
            # trainer._load_best_metric): adopt process 0's view.
            import numpy as np
            from jax.experimental import multihost_utils

            latest = int(multihost_utils.broadcast_one_to_all(
                np.int64(-1 if latest is None else latest)))
            latest = None if latest < 0 else latest
        if latest is None:
            if is_main:
                print("--resume: no checkpoint found, starting fresh")
        else:
            # restore_state materializes straight onto the mesh with the
            # trainer's shardings (TP leaves come back model-sharded, not
            # replicated) and works under multi-host too. The explicit
            # step keeps the collective restore uniform even if the
            # per-process checkpoint dirs have drifted.
            state = trainer.restore_state(step=latest)
            if is_main:
                print(f"resumed from step {latest}")

    eval_fn = None
    if cfg.train.eval_every_steps:
        # Under --multihost the val set is PROCESS-SHARDED: each process
        # scores its contiguous block (DatasetShard) on its local devices
        # and the [C,C] integer confusion matrices are summed across
        # processes (process_allgather — a collective every process
        # enters in lockstep). The summed matrix is bit-identical
        # everywhere, so the best-checkpoint decision — which gates a
        # collective orbax save — is process-uniform BY CONSTRUCTION,
        # with none of the N-fold redundancy of a replicated protocol
        # (each process evaluates |val|/nprocs images; sharded == full
        # eval exactly because integer matrices from disjoint shards sum
        # to the full-set matrix — pinned by tests/test_multihost.py).
        from em_adapt_tpu.eval.predict import Evaluator

        # `or` would silently treat an explicit --synthetic-val 0 as
        # unset and fall back to the size/4 default (advisor finding,
        # round 4): test None explicitly (non-positive values were
        # rejected at the top of cmd_train).
        n_val = getattr(args, "synthetic_val", None)
        if n_val is None:
            n_val = max((args.synthetic or 8) // 4, 2)
        if args.synthetic and getattr(args, "synthetic_learnable", False):
            from em_adapt_tpu.data.pipeline import LearnableSyntheticVOC

            # category="val" already offsets the generator seed by 10k, so
            # train/val streams are disjoint at the same base seed.
            val_ds = LearnableSyntheticVOC(
                n=n_val,
                num_classes=cfg.model.num_classes, seed=cfg.train.seed,
                category="val", image_size=cfg.data.input_size[0],
            )
        elif args.synthetic:
            val_ds = SyntheticVOC(
                n=n_val, num_classes=cfg.model.num_classes,
                seed=cfg.train.seed + 1, category="val",
            )
        else:
            val_ds = VOCSegmentation(cfg.data, "val")
        # Single-controller: shard eval over the trainer's mesh so the
        # periodic eval rides every chip (multi-host keeps the replicated
        # protocol above; any eval.batch_size works — the Evaluator rounds
        # its chunks up to a data-axis multiple).
        eval_plan = trainer.plan if jax.process_count() == 1 else None
        evaluator = Evaluator(cfg, trainer.model, plan=eval_plan)

        eval_ds = val_ds
        if jax.process_count() > 1:
            from em_adapt_tpu.data.pipeline import DatasetShard

            eval_ds = DatasetShard(
                val_ds, jax.process_index(), jax.process_count()
            )

        def eval_fn(state):
            params = state.params
            if cfg.train.eval_protocol == "voc":
                # Exact VOC protocol (per-image original-resolution compare)
                # so "best" selection matches the headline-number protocol.
                cm = evaluator.confusion_voc(params, eval_ds)
            else:
                vb = batch_iterator(eval_ds, cfg.data,
                                    batch_size=cfg.eval.batch_size,
                                    seed=0, epochs=1, train=False,
                                    drop_remainder=False, pad_remainder=True)
                cm = evaluator.confusion_fixed(params, vb)
            if jax.process_count() > 1:
                # Cross-process reduction of the integer partial matrices
                # (see the protocol comment above). Without x64, jax
                # silently demotes int64, so the int64 matrix travels as
                # two int32 halves (lo 31 bits / hi) — exact for any
                # pixel count, and with no data-dependent branch: every
                # process enters the collective unconditionally (a
                # per-shard guard could raise on ONE process and
                # deadlock the rest at the allgather barrier).
                import numpy as np
                from jax.experimental import multihost_utils

                lo = (cm % (1 << 31)).astype(np.int32)
                hi = (cm >> 31).astype(np.int32)
                glo, ghi = multihost_utils.process_allgather((lo, hi))
                cm = (
                    np.asarray(glo).astype(np.int64)
                    + (np.asarray(ghi).astype(np.int64) << 31)
                ).sum(axis=0)
            from em_adapt_tpu.eval.miou import miou_from_confusion

            miou, _ = miou_from_confusion(cm)
            return float(miou)

    logger = MetricLogger(args.log_jsonl) if is_main else None
    log_fn = logger
    if cfg.train.calibrate_estep:
        # One-off measurement of the deployed E-step at this run's
        # score-map shape (BASELINE.md metric; the reference's host numpy
        # E-step is 38.7 ms/img). Stamped into every train JSONL record.
        # One tiny jit, persistently cached across invocations. The
        # trainer's mesh is threaded through so the SAME impl the train
        # step deploys is timed (shard_mapped Pallas on a dp mesh, not
        # the meshless XLA fallback) — which also means EVERY process
        # must run it (the shard_mapped path contains a collective; only
        # process 0 entering it would deadlock a multi-host run).
        from em_adapt_tpu.utils.profiling import measure_estep_us_per_image

        estep_us = round(measure_estep_us_per_image(
            cfg.model, cfg.estep, cfg.train.batch_size,
            mesh=trainer.plan.mesh, data_axis=trainer.plan.data_axis), 1)
        if is_main:
            print(f"estep calibration: {estep_us} us/image "
                  f"(impl={cfg.estep.impl}, batch={cfg.train.batch_size})")
        if logger is not None:
            def log_fn(m, _logger=logger, _v=estep_us):
                # _calib suffix: this is the startup CALIBRATION constant
                # (one measurement of the deployed E-step impl at this
                # run's shape), not a live per-step timing — per-step
                # device timing would need a profiler trace
                # (tools/profile_step.py), not a scalar fetch.
                if "loss" in m:
                    m = {**m, "estep_us_per_image_calib": _v}
                _logger(m)

    batches = batch_iterator(
        ds, cfg.data, batch_size=cfg.train.batch_size, seed=cfg.train.seed,
        epochs=None, train=True, process_shard=process_shard,
        # Deterministic data-order resume: each microbatch step consumes
        # exactly one batch, so the restored step count IS the stream
        # position (bit-identical to never having stopped).
        start_step=int(jax.device_get(state.step)),
    )
    if args.device_data:
        import itertools

        cached = []
        for _ in range(args.device_data):
            cached.append(trainer.plan.ensure_batch_sharded(next(batches)))
        batches = itertools.cycle(cached)
        if is_main:
            print(f"device-data mode: cycling {len(cached)} device-resident "
                  f"batches (host pipeline + H2D excluded)")
    with trace_context(args.profile_dir):
        state = trainer.fit(
            state, batches, num_steps=args.steps, log_fn=log_fn, eval_fn=eval_fn
        )
    trainer.checkpointer.save(state, tag="norm")
    trainer.checkpointer.close()
    if logger is not None:
        logger.close()
    if is_main:
        print(f"done at step {int(jax.device_get(state.step))}")
    return 0


def cmd_eval(args) -> int:
    import dataclasses

    import jax

    _setup_jax()

    from em_adapt_tpu.data import SyntheticVOC, VOCSegmentation, batch_iterator
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.train import Trainer

    cfg = _load_cfg(args.overrides)
    if args.checkpoint:
        cfg = cfg.replace(
            checkpoint=dataclasses.replace(cfg.checkpoint, save_dir=args.checkpoint)
        )
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = _load_inference_params(trainer, cfg, "evaluating")

    if args.synthetic:
        ds = SyntheticVOC(n=args.synthetic, num_classes=cfg.model.num_classes,
                          seed=cfg.train.seed + 1, category="val")
    else:
        ds = VOCSegmentation(cfg.data, "val")
    model, params = trainer.model, state.params
    if args.int8:
        from em_adapt_tpu.eval.quantize import quantize_model

        calib = batch_iterator(ds, cfg.data, batch_size=cfg.eval.batch_size,
                               seed=0, epochs=1, train=False,
                               drop_remainder=False, pad_remainder=True)
        first = next(iter(calib))["image"]
        model, params = quantize_model(cfg.model, params, [first])
        print(f"int8 PTQ: calibrated on {first.shape[0]} images")
    # Shard the evaluation over the full device mesh (data axis) so eval
    # uses every chip; single-chip and multi-host fall back to plain jit.
    ev = Evaluator(
        cfg, model,
        plan=trainer.plan if jax.process_count() == 1 else None,
    )
    crf_applied = False
    if args.fixed_size:
        if args.crf:
            print("warning: --crf is ignored with --fixed-size (the CRF "
                  "runs only in the original-resolution VOC protocol)",
                  file=sys.stderr)
        batches = batch_iterator(ds, cfg.data, batch_size=cfg.eval.batch_size,
                                 seed=0, epochs=1, train=False,
                                 drop_remainder=False, pad_remainder=True)
        miou, iou = ev.evaluate_fixed(params, batches)
    else:
        # --crf turns the CRF on; without the flag, fall back to the
        # eval.use_crf config field (evaluate_voc's None sentinel) so
        # `em-adapt eval eval.use_crf=true` is honored.
        use_crf = True if args.crf else None
        crf_applied = use_crf if use_crf is not None else cfg.eval.use_crf
        miou, iou = ev.evaluate_voc(params, ds, use_crf=use_crf)
    from em_adapt_tpu.data.voc import VOC_CLASS_NAMES

    for i, v in enumerate(iou):
        name = VOC_CLASS_NAMES[i] if i < len(VOC_CLASS_NAMES) else str(i)
        print(f"  IoU[{name}] = {v:.4f}")
    print(f"mIoU = {miou:.4f}" + (" (with CRF)" if crf_applied else ""))
    return 0


def cmd_convert(args) -> int:
    from em_adapt_tpu.data.voc import convert_dataset

    if not args.voc_seg and not args.sbd_cls:
        print("error: need at least one of --voc-seg / --sbd-cls", file=sys.stderr)
        return 2
    convert_dataset(args.voc_seg, args.sbd_cls, args.out)
    return 0


def cmd_predict(args) -> int:
    """Batch inference: decode -> preprocess -> logits -> upsample to the
    original resolution -> (optional CRF) -> palette-indexed PNG mask.

    The prediction recipe is the reference's (bilinear logits upsample +
    channel argmax, reference network.py:39-41) with the dead predict stub
    (network.py:57-75) made real; masks use the VOC palette so they drop
    into any VOC tooling. Inputs run through the network in chunks of
    ``eval.batch_size`` (one dispatch per chunk, tail padded — a single
    compile for the whole run) with host post-processing on a worker
    pool, so predicting a directory rides the same batched serving path
    PROFILE.md measures.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from em_adapt_tpu.data.augment import preprocess_eval
    from em_adapt_tpu.data.voc import VOC_PALETTE, index_to_rgb
    from em_adapt_tpu.train import Trainer

    _setup_jax()
    cfg = _load_cfg(args.overrides)
    if args.checkpoint:
        cfg = cfg.replace(
            checkpoint=dataclasses.replace(cfg.checkpoint, save_dir=args.checkpoint)
        )
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = _load_inference_params(trainer, cfg, "predicting with")

    model, params = trainer.model, state.params
    _pre_cache: dict[str, tuple] = {}

    def _load_pair(path):
        """Decoded raw + preprocessed model input for one file, consuming
        the int8-calibration cache so those files are decoded once."""
        cached = _pre_cache.pop(path, None)
        if cached is not None:
            return cached
        raw = np.asarray(Image.open(path).convert("RGB"))
        img, _ = preprocess_eval(raw, None, input_size=cfg.model.input_size)
        return raw, img

    if args.int8:
        # Self-calibration on the prediction inputs themselves (PTQ needs
        # only activation RANGES, not labels — the inputs are exactly the
        # distribution being served).
        from em_adapt_tpu.eval.quantize import quantize_model

        calib = []
        for path in args.inputs[:8]:
            raw, img = _load_pair(path)
            calib.append(img)
            # The first chunk re-reads these same files; cache the
            # decoded+preprocessed pair so calibration doesn't double the
            # startup decode/resize work.
            _pre_cache[path] = (raw, img)
        model, params = quantize_model(
            cfg.model, params, [np.stack(calib)]
        )
        print(f"int8 PTQ: calibrated on {len(calib)} input images")
    logits_fn = jax.jit(lambda p, x: model.apply(p, x, train=False))
    os.makedirs(args.out, exist_ok=True)

    palette = [c for rgb in VOC_PALETTE for c in rgb]
    palette += [224, 224, 192] * (256 - len(VOC_PALETTE))  # void-ish filler

    from concurrent.futures import ThreadPoolExecutor

    from em_adapt_tpu.data.augment import resize_bilinear_np

    def _post(lg, raw, path):
        # Upsample + softmax on the HOST (same rationale as
        # eval/predict.py::_post): device-side per-image dynamic shapes
        # cost a fresh compile per distinct input size plus ~3 relay
        # round trips of the full-resolution probability map.
        up = resize_bilinear_np(np.asarray(lg, np.float32), raw.shape[:2])
        if args.crf:
            from em_adapt_tpu.eval.crf import dense_crf

            e = np.exp(up - up.max(axis=-1, keepdims=True))
            probs = e / e.sum(axis=-1, keepdims=True)
            up = np.asarray(dense_crf(probs, raw, cfg.eval))
        pred = up.argmax(-1).astype(np.uint8)
        stem = os.path.splitext(os.path.basename(path))[0]
        mask = Image.fromarray(pred, mode="P")
        mask.putpalette(palette)
        mask_path = os.path.join(args.out, f"{stem}.png")
        mask.save(mask_path)
        msg = mask_path
        if args.overlay:
            overlay = (0.5 * raw + 0.5 * index_to_rgb(pred)).astype(np.uint8)
            ov_path = os.path.join(args.out, f"{stem}_overlay.png")
            Image.fromarray(overlay).save(ov_path)
            msg += f" (+ {os.path.basename(ov_path)})"
        classes = [int(c) for c in np.unique(pred)]
        return f"{path} -> {msg}  classes={classes}"

    # One dispatch per CHUNK of images, not per image: the serial loop
    # paid the per-dispatch floor (~30 ms on this rig's relay) per image,
    # while the batched network amortizes it — the same batching that
    # gives the PROFILE.md serving numbers. The chunk size is
    # min(eval.batch_size, N) and the tail zero-pads up to it, so the
    # whole run costs exactly ONE compile; per-image post-processing
    # (host upsample + optional CRF + PNG encode) overlaps the next
    # chunk's device work on a thread pool (the CRF's native lattice and
    # PIL's encoder both release the GIL). Results print in input order.
    bs = max(1, min(cfg.eval.batch_size, len(args.inputs)))
    workers = max(1, cfg.eval.crf_workers if args.crf else 2)
    if args.crf:
        from em_adapt_tpu.eval.permutohedral import available

        if not available():
            # The bilateral-grid fallback allocates a ~250 MB dense grid
            # per in-flight image (see eval/predict.py) — run it serial.
            workers = 1
    futures = []
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for start in range(0, len(args.inputs), bs):
            chunk = args.inputs[start:start + bs]
            pairs = [_load_pair(p) for p in chunk]
            raws = [r for r, _ in pairs]
            imgs = np.stack([im for _, im in pairs])
            if len(chunk) < bs:
                imgs = np.concatenate([
                    imgs,
                    np.zeros((bs - len(chunk),) + imgs.shape[1:], imgs.dtype),
                ])
            lgs = jax.device_get(logits_fn(params, jnp.asarray(imgs)))
            for lg, raw, path in zip(lgs, raws, chunk):
                futures.append(pool.submit(_post, lg, raw, path))
            while len(futures) > 4 * workers:
                print(futures.pop(0).result())
        for fut in futures:
            print(fut.result())
    return 0


def cmd_export(args) -> int:
    import dataclasses

    import jax

    from em_adapt_tpu.eval.export import export_predict_fn
    from em_adapt_tpu.train import Trainer

    _setup_jax()
    cfg = _load_cfg(args.overrides)
    if args.checkpoint:
        cfg = cfg.replace(
            checkpoint=dataclasses.replace(cfg.checkpoint, save_dir=args.checkpoint)
        )
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = _load_inference_params(trainer, cfg, "exporting")
    if args.format == "npy":
        if args.int8 or args.calib_images:
            print("error: --int8/--calib-images apply only to "
                  "--format stablehlo (the npy interchange format is the "
                  "reference's f32 init.npy contract)", file=sys.stderr)
            return 2
        from em_adapt_tpu.eval.export import export_params_npy

        export_params_npy(state.params, args.out)
        import os

        print(f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB)")
        return 0
    model, params = trainer.model, state.params
    if args.int8:
        import numpy as np

        from em_adapt_tpu.eval.quantize import quantize_model

        if args.calib_images:
            from PIL import Image

            from em_adapt_tpu.data.augment import preprocess_eval

            calib = [
                preprocess_eval(
                    np.asarray(Image.open(p).convert("RGB")), None,
                    input_size=cfg.model.input_size,
                )[0]
                for p in args.calib_images
            ]
            calib_batch = np.stack(calib)
        else:
            # No images: synthesize uint8 pixels; quantize_model applies
            # the wire preprocessing (BGR + Caffe mean) itself. Ranges
            # only — adequate for the first layer, looser than real data
            # for deep layers; prefer --calib-images for production.
            g = np.random.default_rng(0)
            h, w = cfg.model.input_size
            calib_batch = g.integers(
                0, 256, size=(8, h, w, 3), dtype=np.uint8
            )
            print("warning: --int8 without --calib-images calibrates on "
                  "synthetic data; pass representative images for "
                  "production artifacts")
        model, params = quantize_model(cfg.model, params, [calib_batch])
        print("int8 PTQ applied (s8xs8->s32 MXU serving graph)")
    blob = export_predict_fn(cfg, model, params, args.batch_size)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob) / 1e6:.1f} MB)")
    return 0


def cmd_info(_args) -> int:
    import jax

    from em_adapt_tpu.config import ExperimentConfig, flatten
    from em_adapt_tpu.version import __version__

    print(f"em-adapt-tpu {__version__}")
    print(f"jax {jax.__version__}, devices: {jax.devices()}")
    for k, v in flatten(ExperimentConfig()).items():
        print(f"  {k} = {v}")
    return 0


def cmd_import_tf(args) -> int:
    """Reference tf.train.Saver checkpoint -> orbax warm-start source.

    The inverse interop direction of ``export --format npy``: a model
    TRAINED by the reference (readme.md's downloadable checkpoints, or a
    user's own run) becomes evaluable/servable/fine-tunable here. The
    written checkpoint is a full fresh TrainState (zeroed optimizer
    slots, step 0, seed RNG) whose params are the imported weights —
    exactly what ``--warm-start`` grafts and what ``eval``/``predict``
    load.
    """
    import dataclasses

    import numpy as np

    _setup_jax()
    import jax
    import jax.numpy as jnp

    from em_adapt_tpu.models.tf_import import (
        load_tf_checkpoint_params,
        params_l2,
    )
    from em_adapt_tpu.train import Trainer

    cfg = _load_cfg(args.overrides)
    cfg = cfg.replace(
        checkpoint=dataclasses.replace(
            cfg.checkpoint, save_dir=args.out, async_save=False
        )
    )
    imported = load_tf_checkpoint_params(args.prefix, cfg.model)
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.init_state()
    params = jax.tree.map(
        lambda cur, new: jax.device_put(
            jnp.asarray(new, cur.dtype), cur.sharding
        ),
        state.params,
        imported,
    )
    state = state.replace(params=params)
    trainer.checkpointer.save(state, tag="norm")
    trainer.checkpointer.close()
    n_params = sum(
        int(np.prod(v.shape)) for layer in imported.values()
        for v in layer.values()
    )
    print(
        f"imported {args.prefix} -> {args.out} "
        f"({len(imported)} layers, {n_params:,} params, "
        f"weight L2 {params_l2(imported):.6f}); use with "
        f"'em-adapt train --warm-start {args.out}' or "
        f"'em-adapt eval --checkpoint {args.out}'"
    )
    return 0


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    return {
        "train": cmd_train,
        "eval": cmd_eval,
        "convert": cmd_convert,
        "predict": cmd_predict,
        "export": cmd_export,
        "import-tf": cmd_import_tf,
        "info": cmd_info,
    }[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
